"""BENCH harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): warm session, AQE on, each query fully
materialized through the noop sink (no driver-side row transfer),
median of N_ITER runs per query. DuckDB baseline for the same queries is
recorded by tools/bench_duckdb.py into BASELINE.md.

``ev_funnel``'s DuckDB oracle is pathological (60s on a correlated-IN
chain at sf0.1) so the suite-vs-DuckDB ratio is reported both with and
without it — quote ``total_excl_ev_funnel`` when comparing engines.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ITER = int(os.environ.get("SPARK_GRAFT_BENCH_ITER", "3"))

# headline set: TPC-H relational core + the heavy LLM-pipeline operators
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "window_topk_per_group",
    "grouping_rollup",
    "agg_count_distinct",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_minhash_lsh",
    "llm_ann_ivf_topk",
    "llm_text_quality",
    "ev_sessionize",
    "ev_funnel",
    # wide-table + TPC-DS-pattern coverage (round 2)
    "hits_q09",
    "hits_q12",
    "tpcds_rollup_inventory",
    "tpcds_rank_in_category",
    # round-2 additions: inverted-index BM25 + grid-bucketed spatial join
    "fts_bm25_topk",
    "geo_spatial_join",
]


def _table_rows(sf_dir: str) -> dict[str, int]:
    """Row count per table from parquet footers (no data scan) — recorded
    in the bench JSON so a stale/undersized data dir can't silently
    produce non-credible numbers (round-5 postmortem)."""
    import glob

    import pyarrow.parquet as pq

    rows: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            rows[name] = pq.ParquetFile(path).metadata.num_rows
        except Exception:  # noqa: BLE001 — directory-style parquet
            n = 0
            for part in glob.glob(os.path.join(path, "*.parquet")):
                n += pq.ParquetFile(part).metadata.num_rows
            rows[name] = n
    return rows


def _cpu_ticks() -> tuple[int, int]:
    """(total_ticks, steal_ticks) from /proc/stat — steal is time the
    hypervisor ran someone else while this VM wanted the CPU. A steal
    burst mid-run is external contention no in-guest loadavg shows
    (r9 observation: untouched 15k-row queries swinging 3× between
    passes while the guest was otherwise idle)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts]
        # first 8 fields only (user nice system idle iowait irq softirq
        # steal): guest/guest_nice are already included in user/nice, so
        # summing them double-counts guest time and understates steal%
        return sum(vals[:8]), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError):
        return 0, 0


def _machine_load() -> dict:
    """Contention telemetry recorded with every bench run (round-8
    postmortem: a contended sf0.1 pass read as a phantom 2× regression).
    ``contended`` flags the run as not trustworthy for comparisons."""
    ncpu = os.cpu_count() or 1
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:  # platform without getloadavg
        la1 = la5 = la15 = -1.0
    nproc = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    if fh.read().split(") ")[-1].split()[0] == "R":
                        nproc += 1
            except OSError:
                continue
    except OSError:
        nproc = -1
    total_ticks, steal_ticks = _cpu_ticks()
    return {
        "cpu_ticks_total": total_ticks,
        "cpu_ticks_steal": steal_ticks,
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "running_procs": nproc,
        "ncpu": ncpu,
        # >25% of cores already busy before we start → numbers unusable
        "contended": bool(la1 > 0.25 * ncpu),
    }


def main() -> None:
    from databend_spark.session import get_spark
    from databend_spark.suite import queries

    load_before = _machine_load()
    if load_before["contended"]:
        print(
            f"WARNING: machine busy (loadavg {load_before['loadavg_1m']}"
            f" on {load_before['ncpu']} cpus) — bench numbers will not be"
            " comparable; rerun on an idle box",
            file=sys.stderr,
        )

    spark = get_spark("bench")
    qs = queries()

    # warm-up: JVM + parquet footers + codegen paths
    qs["tpch_q1"](spark, SF_DIR).write.mode("overwrite").format("noop").save()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sec0_ticks = _cpu_ticks()
    times: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(N_ITER):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 3)
    sec1_ticks = _cpu_ticks()

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "total_excl_ev_funnel": round(
            total - times.get("ev_funnel", 0.0), 3
        ),
        "sf": float(sf),
        "table_rows": _table_rows(SF_DIR),
        "load_before": load_before,
    }

    # primary scale: sf1 (facts replicated 10×, tools/gen_scale.py) —
    # the sf0.1 numbers above are the fixed-overhead floor check; the
    # sf1 run shows throughput once Spark's per-query floor amortizes
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data", "sf1"),
    )
    if not os.path.isdir(sf1_dir) and os.environ.get("SPARK_GRAFT_SKIP_SF1") != "1":
        try:  # build once from the sf0.1 parquet (tools/gen_scale.py)
            import contextlib

            from tools.gen_scale import main as _gen

            _argv, sys.argv = sys.argv, ["gen_scale", "10", SF_DIR, sf1_dir]
            try:
                # gen_scale prints per-table progress; stdout must stay
                # reserved for the ONE bench JSON line (a fresh checkout
                # regenerates sf1 in-run, and its prints otherwise land
                # in the captured bench output)
                with contextlib.redirect_stdout(sys.stderr):
                    _gen()
            finally:
                sys.argv = _argv
        except Exception:  # noqa: BLE001 — sf1 is optional
            pass
    if os.path.isdir(sf1_dir) and os.environ.get("SPARK_GRAFT_SKIP_SF1") != "1":
        # section isolation: the sf1 numbers must not inherit cache/storage
        # state from the sf0.1 loop (round-6 postmortem — leaked persists
        # poisoned every sf1 measurement)
        spark.catalog.clearCache()
        sf1_times: dict[str, float] = {}
        for name in HEADLINE:
            samples = []
            for _ in range(max(2, N_ITER - 1)):
                t0 = time.perf_counter()
                qs[name](spark, sf1_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(time.perf_counter() - t0)
            sf1_times[name] = round(statistics.median(samples), 3)
        sf1_total = round(sum(sf1_times.values()), 3)
        out["sf1_total"] = sf1_total
        out["sf1_queries"] = sf1_times
        out["sf1_total_excl_ev_funnel"] = round(
            sf1_total - sf1_times.get("ev_funnel", 0.0), 3
        )
        out["sf1_table_rows"] = _table_rows(sf1_dir)
        # per-section steal: a burst localized to one scale's loop must
        # not silently poison interpretation of the other (r9: one pass
        # read 1.34% aggregate steal — under the gate — while the burst
        # concentrated in the sf1 tail inflated its last queries 20×)
        sf1_end = _cpu_ticks()
        d = sf1_end[0] - sec1_ticks[0]
        out["sf1_steal_pct"] = (
            round(100.0 * (sf1_end[1] - sec1_ticks[1]) / d, 2) if d > 0 else -1.0
        )

    # load_after is telemetry only — the bench itself drives loadavg up,
    # so validity is judged on the pre-run state PLUS hypervisor steal
    # during the run: steal is time the host ran someone else while this
    # VM wanted the CPU — external contention invisible to loadavg
    # (r9: untouched 15k-row queries swung 3× between passes from steal
    # bursts). >2% of elapsed CPU stolen → numbers not comparable.
    out["load_after"] = _machine_load()
    dt = out["load_after"]["cpu_ticks_total"] - load_before["cpu_ticks_total"]
    ds = out["load_after"]["cpu_ticks_steal"] - load_before["cpu_ticks_steal"]
    out["steal_during_run_pct"] = round(100.0 * ds / dt, 2) if dt > 0 else -1.0
    d0 = sec1_ticks[0] - sec0_ticks[0]
    out["sf_steal_pct"] = (
        round(100.0 * (sec1_ticks[1] - sec0_ticks[1]) / d0, 2) if d0 > 0 else -1.0
    )
    # a run whose steal could not be measured (-1.0 sentinel) is NOT
    # valid — unknown steal must not pass the gate (r9 ADVICE)
    out["valid"] = (
        not out["load_before"]["contended"]
        and 0.0 <= out["steal_during_run_pct"] < 2.0
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

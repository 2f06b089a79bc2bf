"""Local replica of the driver's t2 correctness gate.

Runs every suite query on Spark AND its DuckDB oracle at a given sf dir,
compares row count, column names/order-insensitive values. Run:

    python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    """Sort columns by name, normalize values, sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        return v

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def _typed(v):
    """Type-tagged repr, the strictest portable stand-in for the driver's
    value hash: two engines only hash-match if values agree at repr level
    (so Decimal('47.82') != 47.82 here, though == numerically)."""
    if isinstance(v, tuple):
        return tuple(_typed(x) for x in v)
    if isinstance(v, float):
        # floats hash by shortest-repr; both engines emit IEEE doubles
        return ("f", repr(v))
    return (type(v).__name__, repr(v))


def value_hash(norm_rows):
    import hashlib

    h = hashlib.sha256()
    for r in norm_rows:
        h.update(repr(tuple(_typed(x) for x in r)).encode())
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    from databend_spark.suite import oracle_sql, queries

    # Replicate the DRIVER, not our own builder: a bare SparkSession with
    # none of get_spark()'s confs. register_tables() must make any bare
    # session correct via ensure_session_confs() — round 1 failed 50/50
    # because this divergence was never exercised locally.
    from pyspark.sql import SparkSession

    import os

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("check_oracle_bare")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs, oracles = queries(), oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    report: list[str] = []

    def emit(line: str):
        print(line, flush=True)
        report.append(line)

    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            emit(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            emit(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            emit(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                ok = False
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
            elif value_hash(ns) != value_hash(nd):
                # Driver-replica strict hash: Python numeric == is
                # cross-type (Decimal('1.5') == 1.5), but the driver
                # hashes reprs — a Decimal on one side and a float on
                # the other passes the value compare yet hash-reds on
                # the board (r2 tpch_q2/q11). Catch that class here.
                ok = False
                tdiff = [
                    (a, b)
                    for a, b in zip(ns, nd)
                    if tuple(map(_typed, a)) != tuple(map(_typed, b))
                ][:3]
                msgs.append(f"HASH mismatch (type-class divergence): {tdiff}")
        if ok:
            emit(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            emit(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
    print("\n===RESULTS===")
    for line in report:
        print(line)
    print(f"{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

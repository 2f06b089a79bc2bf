"""Generate the TPC-H / TPC-DS parquet caches the reference SLT suites use.

The reference's prepare scripts
(``tests/sqllogictests/scripts/prepare_{tpch,tpcds}_data.sh``) load
dbgen/dsdgen data at sf=1 into databases named ``tpch_test`` and
``tpcds``; the SLT runner (``databend_spark/testkit/runner.py``
``_BENCH_DBS``) attaches these caches as external parquet tables when a
suite issues ``USE tpch_test`` / ``USE tpcds``.

Data is generated locally with DuckDB's bundled dbgen/dsdgen extensions
(deterministic output for a given sf) — run once per workspace:

    python tools/gen_bench_dbs.py [tpch_sf] [tpcds_sf]

Defaults: tpch sf=1 (matches the reference's validate_duckdb.py) and
tpcds sf=1. Output directories are derived from the requested sf
(``tpch_sf{sf}``), so a custom-scale run can never mislabel the default
cache (ADVICE r2). The SLT runner attaches the sf1 directories.
"""

from __future__ import annotations

import os
import sys

import duckdb

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench_data")


def gen(kind: str, sf: float, out_dir: str) -> None:
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        print(f"{out_dir} already generated")
        return
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CALL {'dbgen' if kind == 'tpch' else 'dsdgen'}(sf={sf})")
    tables = [r[0] for r in con.execute("SHOW TABLES").fetchall()]
    for t in tables:
        path = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"COPY {t} TO '{path}' (FORMAT PARQUET)")
        print(f"  {t} -> {path}")
    with open(done, "w") as f:
        f.write(f"{kind} sf={sf}\n")
    print(f"{out_dir}: {len(tables)} tables")


def main_default() -> None:
    """Generate both caches at default scale (idempotent)."""
    gen("tpch", 1.0, os.path.join(ROOT, "tpch_sf1"))
    gen("tpcds", 1.0, os.path.join(ROOT, "tpcds_sf1"))


def _sf_tag(sf: float) -> str:
    return f"{sf:g}"


def main() -> None:
    tpch_sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    tpcds_sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    gen("tpch", tpch_sf, os.path.join(ROOT, f"tpch_sf{_sf_tag(tpch_sf)}"))
    gen("tpcds", tpcds_sf, os.path.join(ROOT, f"tpcds_sf{_sf_tag(tpcds_sf)}"))


if __name__ == "__main__":
    main()

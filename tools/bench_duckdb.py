"""DuckDB baseline for BASELINE.md: runs each headline query's oracle SQL
on the same parquet files, same machine. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ITER = int(os.environ.get("SPARK_GRAFT_BENCH_ITER", "2"))
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    from bench import HEADLINE
    from databend_spark.suite import oracle_sql

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracles = oracle_sql()
    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue
        best = float("inf")
        for _ in range(N_ITER):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
            }
        )
    )


if __name__ == "__main__":
    main()

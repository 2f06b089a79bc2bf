"""Isolated per-query timing through the noop sink (guide §1.4).

Usage: python tools/time_query.py <query> [n_iter] [sf_dir]
Prints per-iteration seconds + median. Machine-load telemetry included
so a contended number can't masquerade as a regression.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import _machine_load
    from databend_spark.session import get_spark
    from databend_spark.suite import queries

    load = _machine_load()
    spark = get_spark("time_query")
    qs = queries()
    # warm: JVM + parquet footers
    qs["tpch_q1"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.sparkContext.setJobDescription(name)
    samples = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        samples.append(dt)
        print(f"iter{i}: {dt:.3f}s", flush=True)
    print(
        f"RESULT {name}: median={statistics.median(samples):.3f}s "
        f"min={min(samples):.3f}s load1m={load['loadavg_1m']}"
    )


if __name__ == "__main__":
    main()

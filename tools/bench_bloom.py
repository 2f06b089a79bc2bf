"""Measure bloom-filter-on-write: equality lookup on a high-cardinality
UNSORTED column, bloom vs plain parquet. Prints one JSON line.

Min/max stats can't prune this shape (every row group spans the full key
domain), so any speedup is the bloom filter's row-group skipping —
the same gap the reference's bloom pruner covers
(storages/fuse/src/pruning/bloom_pruner.rs).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = int(os.environ.get("SPARK_GRAFT_BLOOM_ROWS", str(20_000_000)))


def main() -> None:
    from pyspark.sql import functions as F

    from databend_spark.session import get_spark
    from databend_spark.sources.bloom import bloom_write

    spark = get_spark("bench_bloom")
    # high-cardinality key in RANDOM order: min/max stats are useless
    df = (
        spark.range(ROWS)
        .withColumn("k", F.xxhash64("id"))
        .withColumn("payload", F.concat(F.lit("row_"), F.col("id")))
    )
    base = tempfile.mkdtemp(prefix="bloom_bench_")
    plain, bloomed = f"{base}/plain", f"{base}/bloom"
    df.repartition(8).write.option("parquet.block.size", str(8 << 20)).parquet(plain)
    bloom_write(df, bloomed, ["k"], ndv=ROWS // 160, num_files=8,
                block_size=8 << 20)

    # probe keys that exist (hash of known ids)
    probes = [
        r.k for r in spark.range(5).select(F.xxhash64("id").alias("k")).collect()
    ]

    def timed(path: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            total = 0
            for p in probes:
                total += spark.read.parquet(path).filter(F.col("k") == p).count()
            assert total == len(probes)
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain, t_bloom = timed(plain), timed(bloomed)
    print(
        json.dumps(
            {
                "metric": "bloom_equality_lookup",
                "rows": ROWS,
                "plain_s": round(t_plain, 3),
                "bloom_s": round(t_bloom, 3),
                "speedup": round(t_plain / t_bloom, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

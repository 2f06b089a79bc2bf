"""Measure the clustering-on-write effect: selective scan on clustered
vs unclustered lineitem. Prints one JSON line with parquet-level
row-group skipping stats + timings."""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rowgroups_matching(path_glob: str, lo, hi) -> tuple[int, int]:
    """Count parquet row groups whose l_shipdate [min,max] intersects
    [lo,hi] — what min/max pruning lets a reader skip."""
    import pyarrow.parquet as pq

    total = matching = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            "l_shipdate"
        ]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                matching += 1
    return matching, total


def main() -> None:
    from datetime import datetime

    from pyspark.sql import functions as F

    from databend_spark.session import get_spark, load_table
    from databend_spark.sources.clustering import cluster_write

    spark = get_spark("bench_clustering")
    li = load_table(spark, f"{SF_DIR}/lineitem.parquet")
    base = tempfile.mkdtemp(prefix="cluster_bench_")
    plain, clustered = f"{base}/plain", f"{base}/clustered"

    # same file count both sides — only layout differs
    li.repartition(16).write.parquet(plain)
    cluster_write(li, clustered, ["l_shipdate", "l_orderkey"], num_files=16)

    lo, hi = datetime(1996, 3, 1), datetime(1996, 3, 31)
    pred = (F.col("l_shipdate") >= F.lit(lo)) & (F.col("l_shipdate") <= F.lit(hi))

    def timed(path: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            (
                spark.read.parquet(path)
                .filter(pred)
                .agg(F.sum(F.col("l_extendedprice").cast("decimal(14,2)")))
                .collect()
            )
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    m_p, t_p = rowgroups_matching(f"{plain}/*.parquet", lo, hi)
    m_c, t_c = rowgroups_matching(f"{clustered}/*.parquet", lo, hi)
    print(
        json.dumps(
            {
                "metric": "clustering_rowgroup_prune",
                "plain": {"rowgroups_scanned": m_p, "rowgroups_total": t_p, "sec": timed(plain)},
                "clustered": {"rowgroups_scanned": m_c, "rowgroups_total": t_c, "sec": timed(clustered)},
                "predicate": "l_shipdate in 1996-03",
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()

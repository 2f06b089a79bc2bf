"""Clustering-on-write (reference CLUSTER BY analog).

Databend clusters table blocks by sort key so per-block min/max prune
scans (``/root/reference/benchmark/tpch/create.sql:29`` clusters
lineitem BY (l_shipdate, l_orderkey); pruning at
``storages/fuse/src/pruning/fuse_pruner.rs:88``). Spark equivalent:
range-partition + sort-within-partitions on write, so parquet row-group
statistics become selective and pushed filters skip row groups.

At 100 TB this is the difference between scanning every file for a
date-range predicate and touching only the files covering the range —
the same reason the reference clusters its bench tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by ``cluster_by``: range-partitioned across
    files (global order → disjoint per-file key ranges) and sorted within
    partitions (monotone row groups → tight min/max)."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )

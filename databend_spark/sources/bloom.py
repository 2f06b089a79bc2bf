"""Bloom-filter-on-write (reference bloom pruner analog).

Databend writes per-block bloom filters and prunes scans with them
(``storages/fuse/src/pruning/bloom_pruner.rs``; fuse_pruner.rs:88-93
chains range → bloom → ngram pruners). Parquet has the same machinery:
``parquet.bloom.filter.enabled`` writes split-block bloom filters per
row group, and Spark's parquet reader (parquet-mr RowGroupFilter with
``parquet.filter.bloom.enabled``, on by default) skips row groups whose
bloom filter rules out an equality predicate.

Where clustering-on-write (``sources/clustering.py``) serves RANGE
predicates on the sort key, bloom filters serve EQUALITY lookups on
high-cardinality UNSORTED columns — min/max stats are useless there
(every row group spans the full domain), which is exactly the gap the
reference's bloom pruner fills. Measured by ``tools/bench_bloom.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bloom_write(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
    block_size: int | None = None,
) -> None:
    """Write parquet with bloom filters on ``bloom_cols``.

    ``ndv`` sizes the filter (expected distinct values per row group);
    oversizing wastes footer bytes, undersizing raises the false-positive
    rate — omitted, parquet-mr uses its default.
    """
    if num_files is not None:
        df = df.repartition(num_files)
    writer = df.write.mode(mode)
    if block_size is not None:
        writer = writer.option("parquet.block.size", str(block_size))
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if ndv is not None:
            writer = writer.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    writer.parquet(path)

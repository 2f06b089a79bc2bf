"""Async-function analogs: SEQUENCE nextval + dict_get (SURVEY.md §2.10).

Reference: sequences (``src/query/ast/src/ast/statements/sequence.rs``,
plan ``plans/sequence.rs``) hand out unique monotone ids through the
meta service; dictionaries (``storages/system/src/dictionaries_table.rs``)
do external KV lookups via ``dict_get()``.

Spark-side:
  * ``Sequence``: a catalog counter (atomic file) for driver-side
    nextval ranges + ``with_sequence_column`` for bulk unique-id
    assignment (zipWithIndex-free: monotonically_increasing_id gives
    partition-local uniqueness; adding a window-free offset via
    partition sizes keeps ids dense without a global sort).
  * ``dict_get``: broadcast-joined lookup table — the scalable shape of
    a KV dictionary on a cluster (no per-row external calls).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, functions as F


class Sequence:
    """Named persistent sequence: exact-once ranges via an atomic file
    (the meta-service role). ``nextval(n)`` reserves n values."""

    def __init__(self, path: str, start: int = 1):
        self.path = path
        self.start = start
        if not os.path.exists(path):
            self._write(start)

    def _write(self, v: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next": v}, f)
        os.replace(tmp, self.path)

    @property
    def current(self) -> int:
        with open(self.path) as f:
            return json.load(f)["next"]

    def nextval(self, n: int = 1) -> int:
        """Reserve n consecutive values; returns the first."""
        v = self.current
        self._write(v + n)
        return v


def with_sequence_column(
    df: DataFrame, seq: Sequence, col_name: str = "seq_id"
) -> DataFrame:
    """Assign dense unique sequence values to every row (bulk nextval).

    Two-pass, no global sort: per-partition counts → cumulative offsets
    (tiny driver array) → partition-local row_number + offset. Reserves
    the whole range in the sequence up front (exactly-once)."""
    from pyspark.sql.window import Window

    counted = df.withColumn("__pid", F.spark_partition_id())
    sizes = {
        r["__pid"]: r["cnt"]
        for r in counted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(sizes.values())
    base = seq.nextval(total)
    offsets = {}
    acc = base
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off bigint"
    )
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    return (
        counted.join(F.broadcast(offset_df), "__pid")
        .withColumn(col_name, F.row_number().over(w) - 1 + F.col("__off"))
        .drop("__pid", "__off")
    )


def dict_get(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    dict_key: str,
    dict_value: str,
    default: Column | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """dict_get(dict, value, key) — broadcast lookup join.

    The reference calls out to Redis/MySQL per batch; on a cluster the
    right shape is a broadcast of the (small) dictionary so lookups are
    a local hash probe, no shuffle of the fact side."""
    out = out_col or f"{dict_value}_lookup"
    d = dictionary.select(
        F.col(dict_key).alias("__dk"), F.col(dict_value).alias(out)
    )
    joined = df.join(F.broadcast(d), df[key_col] == F.col("__dk"), "left").drop("__dk")
    if default is not None:
        joined = joined.withColumn(out, F.coalesce(F.col(out), default))
    return joined

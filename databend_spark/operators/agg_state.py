"""Mergeable partial-aggregate states — the reference's ``_state`` /
``_merge`` aggregate combinators (reference:
src/query/functions/src/aggregates/adaptors/aggregate_combinator_state.rs;
behavior shown in tests/sqllogictests/suites/query/functions/
02_0000_function_aggregate_state.test, where ``sum_state(x)`` is the raw
partial state as a tuple and ``.1`` reads its value).

Spark-first model: a state is an ordinary column — a STRUCT for exact
aggregates, an HLL sketch BINARY for ``uniq`` — produced by a normal
``groupBy`` at fine granularity. Merging is a second ``groupBy`` over
coarser keys. Both stages are plain hash aggregations, so Catalyst gives
partial→final map-side combine at each stage and the states themselves
are shuffle-safe values.

Why this matters at 100 TB: states computed once per (day, shard) can be
stored and re-merged into any coarser rollup (week, region, global)
without rescanning the fact table — the aggregating-index / incremental
materialized-view pattern. Every state here is associative and
commutative, so merging is correct under any partitioning:

  sum   → struct(sum)            merge: sum
  count → struct(cnt)            merge: sum
  avg   → struct(sum, cnt)       merge: sum(sum)/sum(cnt)
  min   → struct(val)            merge: min
  max   → struct(val)            merge: max
  uniq  → hll_sketch_agg binary  merge: hll_union_agg → hll_sketch_estimate

Exact-sum caution: double sums are re-associated across the two stages,
so oracle-compared pipelines should pass a DECIMAL-cast column in (see
suite/base.py docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class StateSpec:
    """One aggregate to carry through a state pipeline.

    kind: sum | count | avg | min | max | uniq
    col:  input column name (ignored for count: count(*) semantics)
    alias: output column name for both the state and the merged value
    """

    kind: str
    col: str
    alias: str


_KINDS = {"sum", "count", "avg", "min", "max", "uniq"}


def _state_col(s: StateSpec) -> Column:
    c = F.col(s.col)
    if s.kind == "sum":
        return F.struct(F.sum(c).alias("sum")).alias(s.alias)
    if s.kind == "count":
        return F.struct(F.count(c).alias("cnt")).alias(s.alias)
    if s.kind == "avg":
        return F.struct(
            F.sum(c).alias("sum"), F.count(c).alias("cnt")
        ).alias(s.alias)
    if s.kind == "min":
        return F.struct(F.min(c).alias("val")).alias(s.alias)
    if s.kind == "max":
        return F.struct(F.max(c).alias("val")).alias(s.alias)
    if s.kind == "uniq":
        return F.hll_sketch_agg(c).alias(s.alias)
    raise ValueError(f"unknown state kind {s.kind!r}; expected {_KINDS}")


def _merge_col(s: StateSpec) -> Column:
    c = F.col(s.alias)
    if s.kind == "sum":
        return F.sum(c["sum"]).alias(s.alias)
    if s.kind == "count":
        return F.sum(c["cnt"]).alias(s.alias)
    if s.kind == "avg":
        # double result like the reference's avg (float64): two-stage
        # decimal sums are exact, so this equals the single-pass avg
        return (
            F.sum(c["sum"]).cast("double") / F.sum(c["cnt"])
        ).alias(s.alias)
    if s.kind == "min":
        return F.min(c["val"]).alias(s.alias)
    if s.kind == "max":
        return F.max(c["val"]).alias(s.alias)
    if s.kind == "uniq":
        return F.hll_sketch_estimate(F.hll_union_agg(c)).alias(s.alias)
    raise ValueError(f"unknown state kind {s.kind!r}; expected {_KINDS}")


def partial_states(
    df: DataFrame, fine_keys: list[str], specs: list[StateSpec]
) -> DataFrame:
    """Aggregate ``df`` to one state row per fine-granularity key."""
    return df.groupBy(*fine_keys).agg(
        *[_state_col(s) for s in specs]
    )


def merge_states(
    state_df: DataFrame, coarse_keys: list[str], specs: list[StateSpec]
) -> DataFrame:
    """Merge stored states up to coarser keys (or ``[]`` for a global
    rollup). Re-mergeable: the output of a sum/count/min/max merge can
    itself be fed back as a state."""
    return state_df.groupBy(*coarse_keys).agg(
        *[_merge_col(s) for s in specs]
    )

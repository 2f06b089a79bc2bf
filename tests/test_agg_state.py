"""_state/_merge combinator analog (operators/agg_state.py).

Reference: aggregate_combinator_state.rs — partial states are exported,
stored, and merged later. The contract pinned here: state+merge is
indistinguishable from direct single-pass aggregation, and merging is
re-entrant (a merged rollup can be merged again)."""

import pytest
from pyspark.sql import functions as F

from databend_spark.operators.agg_state import (
    StateSpec,
    merge_states,
    partial_states,
)

SPECS = [
    StateSpec("sum", "c_acctbal", "s"),
    StateSpec("count", "c_custkey", "n"),
    StateSpec("avg", "c_acctbal", "a"),
    StateSpec("min", "c_acctbal", "lo"),
    StateSpec("max", "c_acctbal", "hi"),
]


@pytest.fixture(scope="module")
def customer(ctx):
    # decimal-cast the measure so two-stage sums are exact (base.py rules)
    return ctx.spark.table("customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("c_acctbal"),
        (F.col("c_custkey") % 7).alias("shard"),
    )


def test_state_merge_equals_direct(customer):
    fine = partial_states(customer, ["c_nationkey", "shard"], SPECS)
    merged = merge_states(fine, ["c_nationkey"], SPECS)
    direct = customer.groupBy("c_nationkey").agg(
        F.sum("c_acctbal").alias("s"),
        F.count("c_custkey").alias("n"),
        (F.sum("c_acctbal").cast("double") / F.count("c_acctbal")).alias("a"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_merge_is_reentrant(customer):
    """A merged rollup re-fed as states gives the same global answer —
    the property that lets day→week→year rollups chain at scale."""
    respecs = [s for s in SPECS if s.kind in ("sum", "count", "min", "max")]
    fine = partial_states(customer, ["c_nationkey", "shard"], respecs)
    nation = merge_states(fine, ["c_nationkey"], respecs)
    # sum/count states are plain struct re-wraps of the merged values
    rewrapped = nation.select(
        F.struct(F.col("s").alias("sum")).alias("s"),
        F.struct(F.col("n").alias("cnt")).alias("n"),
        F.struct(F.col("lo").alias("val")).alias("lo"),
        F.struct(F.col("hi").alias("val")).alias("hi"),
    )
    twice = merge_states(rewrapped, [], respecs).collect()[0]
    once = merge_states(fine, [], respecs).collect()[0]
    assert tuple(twice) == tuple(once)


def test_uniq_state_merge_matches_single_pass(ctx):
    """HLL union of per-shard sketches == one global sketch (the sketch
    is a true algebraic state), and the estimate is near exact."""
    o = ctx.spark.table("orders").select(
        "o_custkey", (F.col("o_orderkey") % 13).alias("shard")
    )
    spec = [StateSpec("uniq", "o_custkey", "u")]
    merged = merge_states(
        partial_states(o, ["shard"], spec), [], spec
    ).collect()[0]["u"]
    single = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("u")
    ).collect()[0]["u"]
    exact = o.select("o_custkey").distinct().count()
    assert merged == single
    assert abs(merged - exact) / exact < 0.05


def test_state_sql_macros(ctx):
    """Databend-flavored SQL surface: sum_state(x).1 reads the state's
    value; sum_merge re-aggregates stored states."""
    row = ctx.sql(
        "SELECT sum_state(number).1 AS s, count_state(number).1 AS n,"
        " max_state(number).2 AS mx FROM numbers(100)"
    ).collect()[0]
    assert (row["s"], row["n"], row["mx"]) == (4950, 100, 99)

    ctx.sql(
        "SELECT sum_state(o_totalprice) AS st, uniq_state(o_custkey) AS us"
        " FROM orders GROUP BY o_orderstatus"
    ).createOrReplaceTempView("order_states")
    merged = ctx.sql(
        "SELECT CAST(sum_merge(st) AS DOUBLE) AS total,"
        " uniq_merge(us) AS custs FROM order_states"
    ).collect()[0]
    direct = ctx.sql(
        "SELECT CAST(sum_merge(st) AS DOUBLE) AS total,"
        " uniq_merge(us) AS custs FROM (SELECT sum_state(o_totalprice)"
        " AS st, uniq_state(o_custkey) AS us FROM orders)"
    ).collect()[0]
    assert merged["total"] == pytest.approx(direct["total"], rel=1e-9)
    assert merged["custs"] == direct["custs"]

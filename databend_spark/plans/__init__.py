"""Physical-plan introspection and assertions.

The reference asserts plan shape via sqllogictest EXPLAIN blocks and
``join_order.test``; our analog inspects Catalyst's formatted physical
plan. Used by tests/test_plans.py to lock in the properties that matter
at 100 TB: parquet filter/column pushdown, broadcast of small dims,
whole-stage codegen coverage, partial aggregation, TopN fusion.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-Catalyst, pre-AQE-finalization)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """The parquet scan must carry PushedFilters mentioning every
    fragment (predicate reached the reader → row-group skipping works)."""
    plan = physical_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, f"no PushedFilters in plan:\n{plan}"
    pushed = " ".join(m)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; got: {pushed}"


def assert_read_schema_only(df: DataFrame, table_marker: str, cols: set[str]) -> None:
    """Column pruning: the scan's ReadSchema must contain exactly
    ``cols`` (a scan reading all columns for a narrow projection is
    wrong at any scale)."""
    plan = physical_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    for s in schemas:
        read = {c.split(":")[0].strip() for c in s.split(",") if c.strip()}
        if read <= cols | {""}:
            return
    raise AssertionError(
        f"no scan restricted to {sorted(cols)}; schemas: {schemas}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved) physical plan — requires executing the query.
    `*(N)` operator prefixes mark whole-stage-codegen spans."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_whole_stage_codegen(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "*(" in plan, f"no codegen spans:\n{plan}"


def assert_partial_aggregation(df: DataFrame) -> None:
    """Map-side combine before the shuffle (HashAggregate appears both
    below and above the exchange)."""
    plan = physical_plan(df)
    assert re.search(r"partial_", plan) or plan.count("HashAggregate") >= 2, (
        f"no partial aggregation:\n{plan}"
    )


def assert_top_n(df: DataFrame) -> None:
    """Sort+limit must fuse to TakeOrderedAndProject (no global sort)."""
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, f"TopN not fused:\n{plan}"

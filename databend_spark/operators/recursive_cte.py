"""Recursive CTE — iterative driver-side fixpoint (SURVEY.md §7.4).

Reference: ``/root/reference/src/query/sql/src/planner/plans/r_cte_scan.rs``
and ``transform_recursive_cte_source.rs``. Spark has no native recursion;
the loop lives in the driver but every iteration is a distributed
DataFrame job, and the accumulated result is localCheckpointed every few
rounds so the lineage (and thus task closure size) stays bounded —
the standard Spark iterative-algorithm pattern.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    anchor: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 1000,
    distinct: bool = False,
    checkpoint_every: int = 10,
) -> DataFrame:
    """UNION ALL recursion: result = anchor ∪ step(anchor) ∪ step²(anchor)…
    until ``step`` yields no rows (or max_iterations).

    With ``distinct=True`` implements UNION (distinct) recursion: new rows
    already present in the accumulated result do not recurse — required
    for graph reachability to terminate on cyclic inputs.
    """
    from pyspark.sql import functions as F

    acc = anchor
    frontier = anchor
    anchor_schema = anchor.schema
    for i in range(max_iterations):
        nxt = step(frontier)
        # each iteration may widen numeric types (e.g. DECIMAL(20,0)+1 →
        # DECIMAL(21,0)); pin every round to the anchor's schema like the
        # reference binder does for the recursive branch
        if nxt.schema != anchor_schema:
            nxt = nxt.select(
                *[
                    F.col(actual).cast(f.dataType).alias(f.name)
                    for actual, f in zip(nxt.columns, anchor_schema.fields)
                ]
            )
        if distinct:
            nxt = nxt.distinct().exceptAll(acc.distinct())
        # one action per iteration; cache the frontier since it is used
        # both for the emptiness check and the next step.
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        acc = acc.unionByName(nxt)
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"recursive CTE did not converge in {max_iterations} iterations")

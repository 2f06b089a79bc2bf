"""ASOF join — nearest-preceding-key temporal join.

Reference: Databend desugars ASOF to a window + inequality join
(``/root/reference/src/query/sql/src/planner/binder/bind_table_reference/
bind_asof_join.rs:50`` ``rewrite_asof``). We use the union-merge
formulation instead, which is strictly better at scale:

    tag left/right → union → single shuffle on (key) → per-key sort by ts
    → last_value(right payload, ignore nulls) carries the most recent
    right row forward → keep left rows.

Cost: ONE shuffle of |L|+|R| rows and no join at all — versus the
inequality-join plan which degenerates to a per-key cross product.
At 100 TB this is the difference between a sort-merge pass and an
explosion; skewed keys are handled by AQE since the window partition
count follows the shuffle partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward'; 'forward' gives the
    smallest ``right_ts >= left_ts``) within the same ``on`` key group.

    ``right_cols`` are the right-side payload columns to carry (they must
    not collide with left column names, except the ts column).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right_cols if c not in keys]

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_cols = keys + [F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")] + [
        F.col(c) for c in payload
    ]
    rhs = right.select(*rhs_cols)

    # align schemas: left lacks payload, right lacks left columns
    left_only = [c for c in lhs.columns if c not in ("__side", "__ts") and c not in keys]
    for c in payload:
        lhs = lhs.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    if direction == "backward":
        # right rows sort before left rows at equal ts → "at or before"
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    elif direction == "forward":
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    carried = unioned.select(
        *[c for c in unioned.columns if c not in payload],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return carried.filter(F.col("__side") == 1).drop("__side", "__ts")

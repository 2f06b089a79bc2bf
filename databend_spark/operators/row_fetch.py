"""Late materialization — TopN row fetch (reference physical_row_fetch.rs).

Reference: ``src/query/service/src/physical_plans/physical_row_fetch.rs``
(after a TopN/filter has reduced the row set, fetch the non-projected
columns by row id instead of carrying every column through the sort).

Spark-first shape: Catalyst already prunes the scan to the ORDER BY
projection when the SELECT is narrow, but ``SELECT * ORDER BY x LIMIT k``
must scan every column of every row. ``topn_late_materialize`` does what
the reference's RowFetch does:

  1. scan ONLY (key, sort columns) — a 2-column pruned parquet read;
  2. TakeOrderedAndProject the top-k keys (tiny);
  3. broadcast-semi-join those k keys back against the full table —
     a point fetch of k wide rows, with the key predicate pushed to the
     parquet scan (bloom/min-max prunable).

At 100 TB the difference is scanning 2 columns vs 100 for the sort, and
the fetch side reads only the row groups containing the k winners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topn_late_materialize(
    df: DataFrame,
    key: str,
    order_by: list,
    k: int,
    sort_columns: list[str] | None = None,
) -> DataFrame:
    """Top-k of ``df`` by ``order_by`` returning ALL columns, scanning
    wide columns only for the k winners.

    ``df`` should be a freshly-read source DataFrame (so the narrow
    projection prunes at the scan); ``key`` must be unique.
    ``order_by``: list of Column expressions or column-name strings.
    ``sort_columns``: the source columns the order expressions read.
    Required when an ``order_by`` entry is a computed Column whose
    stringified form doesn't name its inputs verbatim — the fallback
    inference substring-matches column names against ``str(Column)``,
    which both misses renamed expressions and over-matches colliding
    names like ``id`` in ``vec_id`` (ADVICE r2).
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    narrow = df.select(key, *(sort_columns or _referenced(df, order_by)))
    winners = narrow.orderBy(*order_cols).limit(k).select(key)
    # broadcast the k keys; the equality join pushes into the fetch scan
    fetched = df.join(F.broadcast(winners), key, "left_semi")
    return fetched.orderBy(*order_cols).limit(k)


def _referenced(df: DataFrame, order_by: list) -> list[str]:
    """Columns of df referenced by the order spec (string names, or all
    minus-nothing for Column expressions — conservative: keep names that
    appear in the expression string)."""
    names = []
    for c in order_by:
        if isinstance(c, str):
            names.append(c)
        else:
            s = str(c._jc) if hasattr(c, "_jc") else str(c)
            names.extend([col for col in df.columns if col in s])
    # dedupe, preserve order
    seen = set()
    return [c for c in names if not (c in seen or seen.add(c))]

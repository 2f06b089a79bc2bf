"""Aggregating-index maintenance + query rewrite.

Reference: CREATE AGGREGATING INDEX materializes a partial-aggregate
table and the optimizer rewrites matching scans onto it
(``src/query/sql/src/planner/optimizer/optimizers/rule/agg_rules/
agg_index/query_rewrite.rs``). The Spark-first equivalent:

* the index is a parquet table of PARTIAL aggregates (sum/count/min/max
  per group) — re-aggregable, so queries grouping by any SUBSET of the
  index's group columns can be answered from it;
* ``try_rewrite`` matches simple single-table GROUP BY SQL and rewrites
  it onto the index with merge aggregation (sum-of-sums, sum-of-counts,
  min-of-mins, max-of-maxes, avg = sum/count).

Scale note: at 100 TB this is the classic rollup-cube pattern — the
index table is |groups| rows instead of |fact| rows, so a dashboard
query over it scans orders of magnitude less data. Refresh is
incremental via the streaming layer's Stream/Task (append-only deltas
re-aggregate into the index).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class AggIndex:
    name: str
    table: str
    group_cols: list[str]
    measures: list[str]  # column names with sum/count/min/max partials
    index_table: str = ""
    row_count_col: str = "__cnt"
    extra: dict = field(default_factory=dict)


def build_agg_index(
    spark: SparkSession,
    name: str,
    table: str,
    group_cols: list[str],
    measures: list[str],
) -> AggIndex:
    """Materialize the partial-aggregate table (one shuffle over the
    fact table, then tiny)."""
    aggs = [F.count("*").alias("__cnt")]
    for m in measures:
        aggs += [
            F.sum(m).alias(f"__sum_{m}"),
            F.min(m).alias(f"__min_{m}"),
            F.max(m).alias(f"__max_{m}"),
            F.count(m).alias(f"__cnt_{m}"),
        ]
    idx_table = f"__aggidx_{name}"
    spark.sql(f"DROP TABLE IF EXISTS {idx_table}")
    # a killed run can orphan the managed location without a catalog entry
    import os
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, idx_table), ignore_errors=True)
    spark.table(table).groupBy(*group_cols).agg(*aggs).write.mode(
        "overwrite"
    ).saveAsTable(idx_table)
    return AggIndex(
        name=name,
        table=table,
        group_cols=[c.lower() for c in group_cols],
        measures=[m.lower() for m in measures],
        index_table=idx_table,
    )


_SIMPLE_AGG_SQL = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<tbl>[\w.`]+)\s*"
    r"(?:GROUP\s+BY\s+(?P<grp>[\w.,\s`]+?))?\s*"
    r"(?P<tail>(?:ORDER\s+BY|LIMIT)\b.*)?$",
    re.I | re.S,
)
_AGG_ITEM = re.compile(
    r"^(?:(?P<fn>sum|count|min|max|avg)\s*\(\s*(?P<arg>\*|[\w`]+)\s*\)"
    r"|(?P<col>[\w`]+))\s*(?:AS\s+(?P<alias>[\w`]+))?$",
    re.I,
)


def try_rewrite(sql: str, indexes: list[AggIndex]) -> str | None:
    """Rewrite a simple single-table GROUP BY query onto a matching
    aggregating index; None if no index applies. Supported shape:
    ``SELECT <group cols | agg(col)> FROM t GROUP BY <cols> [ORDER/LIMIT]``
    where the group columns are a subset of the index's and every
    aggregated column is an index measure."""
    m = _SIMPLE_AGG_SQL.match(sql.strip().rstrip(";"))
    if not m:
        return None
    tbl = m.group("tbl").strip("`").lower()
    grp = [
        g.strip().strip("`").lower()
        for g in (m.group("grp") or "").split(",")
        if g.strip()
    ]
    items = []
    depth, start, sel = 0, 0, m.group("sel")
    for i, ch in enumerate(sel + ","):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(sel[start:i].strip())
            start = i + 1
    for idx in indexes:
        if idx.table.lower() != tbl:
            continue
        if not set(grp) <= set(idx.group_cols):
            continue
        out_items, ok = [], True
        for it in items:
            am = _AGG_ITEM.match(it)
            if not am:
                ok = False
                break
            alias = am.group("alias")
            if am.group("col"):
                c = am.group("col").strip("`").lower()
                if c not in idx.group_cols:
                    ok = False
                    break
                out_items.append(f"`{c}`" + (f" AS `{alias}`" if alias else ""))
                continue
            fn, arg = am.group("fn").lower(), am.group("arg").strip("`").lower()
            name = alias or it
            if fn == "count" and arg == "*":
                expr = "sum(__cnt)"
            elif arg in idx.measures and fn in ("sum", "min", "max", "count"):
                merge = {"sum": "sum", "min": "min", "max": "max",
                         "count": "sum"}[fn]
                part = {"count": f"__cnt_{arg}"}.get(fn, f"__{fn}_{arg}")
                expr = f"{merge}({part})"
            elif arg in idx.measures and fn == "avg":
                expr = f"sum(__sum_{arg}) / sum(__cnt_{arg})"
            else:
                ok = False
                break
            out_items.append(f"{expr} AS `{name}`")
        if not ok:
            continue
        grp_sql = f" GROUP BY {', '.join(grp)}" if grp else ""
        tail = m.group("tail") or ""
        return (
            f"SELECT {', '.join(out_items)} FROM {idx.index_table}"
            f"{grp_sql} {tail}".strip()
        )
    return None

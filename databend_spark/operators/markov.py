"""markov_train — character-level n-gram transition model.

Reference: ``src/query/functions/src/aggregates/aggregate_markov_tarin.rs``
(the `markov_train` aggregate): for every position in every input string
it records (context → next code point) transitions, where the context is
the up-to-N preceding code points, plus an end-of-string count per
context; the trained model feeds the obfuscator
(``databend_common_base::obfuscator``). The reference keys contexts by
NGramHash and returns array<(hash, total, count_end, buckets)>.

Spark-first re-expression: the transition extraction is an
``explode(sequence(...))`` over character positions — a pure codegen'd
projection, no UDF — and training is an ordinary groupBy count, i.e. a
partial→final hash aggregate that scales like any word-count. The model
keys contexts by the literal context STRING rather than a 32-bit hash
(semantically equivalent, join-able, and oracle-checkable; hashing is a
storage optimization in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitions(df: DataFrame, col: str, order: int = 3) -> DataFrame:
    """(context, next_cp, cnt): one row per observed transition.

    ``next_cp = ''`` marks end-of-string (the reference's count_end).
    """
    s = F.col(col)
    pos = F.explode(F.expr(f"sequence(1, length({col}) + 1)")).alias("i")
    exploded = df.select(s.alias("_s"), pos).select(
        F.expr(f"substr(_s, greatest(1, i - {order}), i - greatest(1, i - {order}))").alias(
            "context"
        ),
        F.expr("IF(i <= length(_s), substr(_s, i, 1), '')").alias("next_cp"),
    )
    return exploded.groupBy("context", "next_cp").agg(F.count("*").alias("cnt"))


def markov_train(df: DataFrame, col: str, order: int = 3) -> DataFrame:
    """Model rows: (context, total, count_end, buckets map<next_cp,cnt>).

    Matches the reference output row shape (hash→context as noted above):
    total = all transitions from the context, count_end = end-of-string
    transitions, buckets = per-next-codepoint counts.
    """
    t = transitions(df, col, order)
    return t.groupBy("context").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.when(F.col("next_cp") == "", F.col("cnt")).otherwise(0)).alias(
            "count_end"
        ),
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("next_cp") != "", F.struct("next_cp", "cnt"))
                )
            )
        ).alias("buckets"),
    )


def transitions_oracle_sql(table: str, col: str, order: int = 3, where: str = "") -> str:
    """DuckDB SQL computing identical (context, next_cp, cnt) rows."""
    w = f"WHERE {where}" if where else ""
    return f"""
    WITH pos AS (
      SELECT {col} AS s, unnest(generate_series(1, length({col}) + 1)) AS i
      FROM {table} {w}
    )
    SELECT substr(s, greatest(1, i - {order}),
                  i - greatest(1, i - {order})) AS context,
           CASE WHEN i <= length(s) THEN substr(s, i, 1) ELSE '' END AS next_cp,
           count(*) AS cnt
    FROM pos GROUP BY context, next_cp
    """

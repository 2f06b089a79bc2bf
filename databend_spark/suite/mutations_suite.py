"""Mutation + misc aggregate suite entries (SURVEY.md §2.1, §2.4)."""

from pyspark.sql import DataFrame, SparkSession, functions as F

from databend_spark.suite.base import register, sql_query


@register(
    "mut_merge_orders",
    oracle="""
    WITH merged AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey <= 100 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS price
        FROM orders
        UNION ALL
        SELECT -(r.range + 1) AS o_orderkey, 100.0 AS price
        FROM range(50) r
    )
    SELECT count(*) AS n,
           CAST(sum(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS total,
           CAST(min(o_orderkey) AS BIGINT) AS min_key
    FROM merged
    """,
)
def mut_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO relational core (plans/mutation.rs RelOp::MergeInto):
    update matched keys (≤100, +1000), insert 50 new synthetic rows,
    keep the rest — verified against the set-op formulation."""
    from databend_spark.operators.mutations import merge_dataframes, src

    target = spark.table("orders").select("o_orderkey", "o_totalprice")
    updates = (
        spark.table("orders")
        .filter(F.col("o_orderkey") <= 100)
        .select("o_orderkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice"))
    )
    inserts = spark.range(50).select(
        (-(F.col("id") + 1)).alias("o_orderkey"),
        F.lit(100.0).alias("o_totalprice"),
    )
    source = updates.unionByName(inserts)
    merged = merge_dataframes(
        target,
        source,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": src("o_totalprice")},
    )
    return merged.agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
    )


# --- higher-moment aggregates via exact decimal sums (skew/kurtosis) --------
sql_query(
    "agg_skew_kurtosis",
    # engine-native skewness/kurtosis differ across engines in both
    # definition (sample vs population) and accumulation order; the
    # explicit population-moment formulas over exact decimal sums are
    # engine-invariant (same pattern as agg_variance_corr).
    """
    WITH q AS (
        -- l_quantity is integral (1..50): exact 64-bit integer moments,
        -- order-independent in any engine
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(CAST(sum(q) AS DECIMAL(38,0)) AS DOUBLE)             AS s1,
               CAST(CAST(sum(q * q) AS DECIMAL(38,0)) AS DOUBLE)         AS s2,
               CAST(CAST(sum(q * q * q) AS DECIMAL(38,0)) AS DOUBLE)     AS s3,
               CAST(CAST(sum(q * q * q * q) AS DECIMAL(38,0)) AS DOUBLE) AS s4
        FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * sqrt(s2 / n - (s1 / n) * (s1 / n)))  AS skewness_pop,
           (s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))
             - 3.0                                       AS kurtosis_excess
    FROM s
    """,
)

# --- mode (deterministic: smallest most-frequent value) ---------------------
sql_query(
    "agg_mode",
    """
    SELECT l_returnflag, qty_mode FROM (
        SELECT l_returnflag, l_quantity AS qty_mode,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY count(*) DESC, l_quantity) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_quantity
    ) t WHERE rn = 1
    """,
    doc="mode() with deterministic tie-break (engine-native mode() "
    "breaks ties arbitrarily; reference aggregate_mode.rs).",
)

# --- group_array_moving_avg / moving sum (reference moving aggs) ------------
sql_query(
    "agg_moving_window",
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / least(CAST(count(*) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS INT), 3)
             AS DOUBLE) AS moving_avg_3,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_sum_3
    FROM orders
    """,
    doc="group_array_moving_{avg,sum} (reference aggregator.rs) as "
    "sliding window frames.",
)


@register(
    "agg_index_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(l_quantity) AS DECIMAL(20,2)) AS sq,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(avg(l_extendedprice) AS DECIMAL(18,4)) AS DOUBLE) AS ap
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_index_rollup(spark, sf_dir):
    """Aggregating-index query rewrite (reference agg_index/
    query_rewrite.rs): the rollup is answered from a materialized
    partial-aggregate table; values must equal the direct aggregation."""
    from databend_spark.operators.agg_index import build_agg_index, try_rewrite

    idx = build_agg_index(
        spark, "suite_li", "lineitem",
        ["l_returnflag", "l_linestatus"], ["l_quantity", "l_extendedprice"],
    )
    sql = (
        "SELECT l_returnflag, sum(l_quantity) AS sq, count(*) AS n, "
        "avg(l_extendedprice) AS ap FROM lineitem GROUP BY l_returnflag"
    )
    rewritten = try_rewrite(sql, [idx])
    assert rewritten and idx.index_table in rewritten
    from pyspark.sql import functions as F

    return (
        spark.sql(rewritten)
        .select(
            "l_returnflag",
            F.col("sq").cast("decimal(20,2)").alias("sq"),
            F.col("n").cast("bigint").alias("n"),
            F.col("ap").cast("decimal(18,4)").cast("double").alias("ap"),
        )
    )


def _markov_oracle() -> str:
    from databend_spark.operators.markov import transitions_oracle_sql

    return (
        transitions_oracle_sql("documents", "text", order=2, where="doc_id < 40")
        + " ORDER BY cnt DESC, context, next_cp LIMIT 50"
    )


@register("agg_markov_train", oracle=_markov_oracle())
def agg_markov_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """markov_train aggregate (reference aggregate_markov_tarin.rs):
    char-level transition counts via explode(sequence) + groupBy —
    a codegen'd projection feeding a partial→final hash agg."""
    from databend_spark.operators.markov import transitions

    docs = spark.table("documents").filter("doc_id < 40")
    return (
        transitions(docs, "text", order=2)
        .orderBy(F.desc("cnt"), "context", "next_cp")
        .limit(50)
    )

"""UDF / UDAF / UDTF surface + histogram + bitmap + json_agg
(SURVEY.md §2.10, §2.4, §2.8)."""

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from databend_spark.suite.base import register, sql_query

# --- Pandas scalar UDF + grouped-agg UDAF (reference UDF server / UDAF,
# plans/udf.rs:32 + plans/udaf.rs:31 — Arrow-vectorized, the PySpark
# strength) ------------------------------------------------------------------


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice * 1.1 + 5.0 AS DOUBLE) AS adjusted
    FROM orders WHERE o_orderkey < 500
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar UDF (vs the reference's Arrow-Flight UDF
    server — same wire concept, in-process). Exact double arithmetic →
    oracle-comparable."""

    @F.pandas_udf("double")
    def adjust(p: pd.Series) -> pd.Series:
        return p * 1.1 + 5.0

    return (
        spark.table("orders")
        .filter(F.col("o_orderkey") < 500)
        .select("o_orderkey", adjust("o_totalprice").alias("adjusted"))
    )


@register(
    "udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                         * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
                / CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS DOUBLE)
             AS weighted_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate via applyInPandas (reference UDAF,
    plans/udaf.rs). Decimal-exact sums inside pandas keep it
    oracle-comparable."""
    from decimal import Decimal

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        q = Decimal(0)
        pq = Decimal(0)
        # exact decimal accumulation (order-independent)
        for price, qty in zip(pdf["l_extendedprice"], pdf["l_quantity"]):
            dq = Decimal(f"{qty:.2f}")
            q += dq
            pq += Decimal(f"{price:.2f}") * dq
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "weighted_price": [float(pq) / float(q)],
            }
        )

    return (
        spark.table("lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(wavg, "l_returnflag string, weighted_price double")
    )


@register(
    "udtf_split_words",
    oracle="""
    SELECT doc_id, word, CAST(length(word) AS INT) AS word_len
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 20) t
    """,
)
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → N output rows. Reference
    analog: SRF factories (srfs/, §2.8)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word string, word_len int")
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            for w in text.split(" "):
                yield doc_id, w, len(w)

    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT sw.* FROM documents d,
        LATERAL split_words(d.doc_id, d.text) sw
        WHERE d.doc_id < 20
        """
    )


# --- histogram (reference aggregate histogram) ------------------------------
sql_query(
    "agg_histogram",
    # equi-width histogram over o_totalprice: bucket = floor(x / 50000)
    """
    SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS bucket,
           count(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY CAST(floor(o_totalprice / 50000.0) AS INT)
    """,
    doc="histogram() aggregate (reference aggregate_histogram.rs) as "
    "deterministic equi-width bucketing.",
)

# --- json aggregation (json_agg / json_object_agg) ---------------------------
sql_query(
    "agg_json",
    """
    SELECT n_regionkey,
           to_json(array_sort(collect_list(n_name))) AS names_json
    FROM nation GROUP BY n_regionkey
    """,
    oracle="""
    SELECT n_regionkey,
           CAST(to_json(list_sort(list(n_name))) AS VARCHAR) AS names_json
    FROM nation GROUP BY n_regionkey
    """,
    doc="json_array_agg (reference json_agg family) via collect+to_json.",
)


# --- bitmap functions (array<bigint> model) ----------------------------------
@register(
    "fn_bitmap",
    oracle="""
    WITH b AS (
        SELECT c_nationkey,
               list_sort(list_distinct(list(c_custkey % 64))) AS bm
        FROM customer GROUP BY c_nationkey
    )
    SELECT a.c_nationkey AS nk_a, c.c_nationkey AS nk_b,
           CAST(len(list_sort(list_intersect(a.bm, c.bm))) AS BIGINT) AS and_count,
           CAST(len(list_sort(list_distinct(a.bm || c.bm))) AS BIGINT) AS or_count,
           list_contains(a.bm, 7) AS has_7
    FROM b a JOIN b c ON a.c_nationkey < c.c_nationkey AND c.c_nationkey <= 5
    WHERE a.c_nationkey <= 5
    """,
)
def fn_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap surface on the sorted-distinct-array model
    (databend_spark.functions.bitmap)."""
    from databend_spark.functions.bitmap import (
        bitmap_and,
        bitmap_contains,
        bitmap_count,
        bitmap_or,
        group_bitmap_agg,
    )

    b = (
        spark.table("customer")
        .groupBy("c_nationkey")
        .agg(group_bitmap_agg(F.col("c_custkey") % 64).alias("bm"))
        .filter(F.col("c_nationkey") <= 5)
    )
    a = b.select(F.col("c_nationkey").alias("nk_a"), F.col("bm").alias("bma"))
    c = b.select(F.col("c_nationkey").alias("nk_b"), F.col("bm").alias("bmb"))
    return (
        a.join(c, F.col("nk_a") < F.col("nk_b"))
        .select(
            "nk_a",
            "nk_b",
            bitmap_count(bitmap_and(F.col("bma"), F.col("bmb"))).alias("and_count"),
            bitmap_count(bitmap_or(F.col("bma"), F.col("bmb"))).alias("or_count"),
            bitmap_contains(F.col("bma"), F.lit(7)).alias("has_7"),
        )
    )

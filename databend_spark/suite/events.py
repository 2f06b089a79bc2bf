"""Event-stream analytics (SURVEY.md §2.4 behavioral aggregates).

The reference ships ClickHouse-style behavioral aggregates —
``window_funnel`` and ``retention``
(``/root/reference/src/query/functions/src/aggregates/aggregator.rs``,
``aggregate_window_funnel.rs``, ``aggregate_retention.rs``) — plus the
events/window test corpus. Implemented Spark-first: sessionization via
window lag + cumulative sum, funnel via staged semi-joins (decorrelated,
shuffle-on-user), retention via conditional bool aggregates.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from databend_spark.suite.base import register, sql_query

# --- sessionization: 30-minute inactivity gap ------------------------------
sql_query(
    "ev_sessionize",
    """
    WITH gaps AS (
        SELECT user_id, event_id,
               CASE WHEN unix_micros(ts) - lag(unix_micros(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, event_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY event_id) AS session_id
        FROM gaps
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, event_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY event_id) AS session_id
        FROM gaps
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
    doc="Sessionization = lag + gap flag + running sum (classic pattern; "
    "in streaming mode session_window(ts, gap) replaces this, see "
    "databend_spark.streaming).",
)


# --- window_funnel: signup → view → purchase within 7 days ------------------
@register(
    "ev_funnel",
    oracle="""
    WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    l3 AS (
        SELECT DISTINCT s.user_id FROM s
        JOIN v ON v.user_id = s.user_id AND v.ts > s.ts
               AND v.ts <= s.ts + INTERVAL 7 DAY
        JOIN p ON p.user_id = s.user_id AND p.ts > v.ts
               AND p.ts <= s.ts + INTERVAL 7 DAY
    ),
    l2 AS (
        SELECT DISTINCT s.user_id FROM s
        JOIN v ON v.user_id = s.user_id AND v.ts > s.ts
               AND v.ts <= s.ts + INTERVAL 7 DAY
    ),
    l1 AS (SELECT DISTINCT user_id FROM s)
    SELECT u.user_id,
           CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                ELSE 0 END AS funnel_level
    FROM (SELECT DISTINCT user_id FROM events) u
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_funnel(7d)(ts, signup, view, purchase): max funnel level
    per user where each step follows the previous and the whole chain
    fits in the window anchored at the signup.

    Plan: per-level candidate sets via staged range joins on user_id
    (one shuffle key), then broadcast flags onto the user list — no
    correlated subqueries, no per-user collect.
    """
    ev = spark.table("events")
    s = ev.filter(F.col("event_type") == "signup").select("user_id", F.col("ts").alias("s_ts"))
    v = ev.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("v_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("p_ts"))
    win = F.expr("s_ts + INTERVAL 7 DAY")

    sv = s.join(v, "user_id").filter((F.col("v_ts") > F.col("s_ts")) & (F.col("v_ts") <= win))
    l2 = sv.select("user_id").distinct().withColumn("f2", F.lit(1))
    l3 = (
        sv.join(p, "user_id")
        .filter((F.col("p_ts") > F.col("v_ts")) & (F.col("p_ts") <= win))
        .select("user_id")
        .distinct()
        .withColumn("f3", F.lit(1))
    )
    l1 = s.select("user_id").distinct().withColumn("f1", F.lit(1))
    users = ev.select("user_id").distinct()
    return (
        users.join(l1, "user_id", "left")
        .join(l2, "user_id", "left")
        .join(l3, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("f3") == 1, 3)
            .when(F.col("f2") == 1, 2)
            .when(F.col("f1") == 1, 1)
            .otherwise(0)
            .alias("funnel_level"),
        )
    )


# --- retention(signup, view, purchase) --------------------------------------
sql_query(
    "ev_retention",
    """
    SELECT user_id,
           CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS INT) AS r1,
           CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INT)   AS r2,
           CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) AS r3
    FROM events GROUP BY user_id
    """,
    doc="retention(c1, c2, c3) semantics (reference "
    "aggregate_retention.rs): first condition gates the rest.",
)

# --- tumbling time buckets ---------------------------------------------------
sql_query(
    "ev_time_buckets",
    """
    SELECT unix_micros(date_trunc('hour', ts)) AS bucket_us,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Batch tumbling windows; streaming variant uses window(ts, '1 hour') "
    "with watermarks (databend_spark.streaming).",
)


# --- top event sequences (bigram transition counts) -------------------------
sql_query(
    "ev_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)

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
    per user where each step strictly follows the previous and the whole
    chain fits in the 7-day window anchored at the chain's signup
    (reference: window_funnel aggregate,
    src/query/functions/src/aggregates/aggregate_window_funnel.rs).

    Plan: ONE shuffle (partitionBy user_id, orderBy ts) and two range-
    bounded window functions — linear per user, no pairwise fanout:
      * s_star(view v)   = max signup ts in [v-7d, v)  — the latest
        signup whose window still covers v; maximizing the start
        maximizes the remaining window, so per view this single state
        dominates every other (s, v) chain state.
      * reach2(view)     = s_star + 7d — how far a purchase may sit.
      * purchase hits L3 ⇔ running max of reach2 over strictly-earlier
        rows ≥ its ts  (v < p strict via the -1µs range bound).
    The r3 plan (staged s×v×p joins on user_id) was quadratic on a
    skewed user (21s at sf1); this is the classic chain-scan shape,
    entirely in JVM window exec + codegen.
    """
    from pyspark.sql import Window

    week_us = 7 * 86400 * 1_000_000
    ev = spark.table("events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_type",
    )
    w_sig = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-week_us, -1)
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        ev.withColumn(
            "s_star",
            F.max(
                F.when(F.col("event_type") == "signup", F.col("ts_us"))
            ).over(w_sig),
        )
        .withColumn(
            "reach2",
            F.when(
                (F.col("event_type") == "view")
                & F.col("s_star").isNotNull(),
                F.col("s_star") + F.lit(week_us),
            ),
        )
        .withColumn("best_reach2", F.max("reach2").over(w_prev))
    )
    return flagged.groupBy("user_id").agg(
        F.greatest(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("best_reach2") >= F.col("ts_us")),
                    3,
                )
            ),
            F.max(F.when(F.col("reach2").isNotNull(), 2)),
            F.max(F.when(F.col("event_type") == "signup", 1)),
            F.lit(0),
        )
        .cast("int")
        .alias("funnel_level")
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

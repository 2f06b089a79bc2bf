"""Structured Streaming operators — capability beyond the reference.

The reference has no watermarks/event-time windows (verified absence,
SURVEY §2.9); Spark gives tumbling/sliding/session windows with
late-data handling for free. These builders wire the driver's events
schema into streaming topologies; tests drive them with the file source
+ memory sink + processAllAvailable() (synchronous micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event parquet/json drops (one file per
    micro-batch in tests; a Kafka source swaps in transparently)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time aggregation with late-data bound."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """session_window sessionization (state-backed; the batch analog is
    ev_sessionize in the suite)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DF synchronously into an in-memory table."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def stateful_user_stats(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count / value sum / last event type across micro-batches.

    This is the escape hatch for operators neither the built-in windows
    nor session_window express (arbitrary per-key state machines). State
    is a compact (count, total, last_type) tuple per user — at 100 TB the
    state store shards by the groupBy key exactly like a shuffle.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        count, total, last_type = (
            state.get if state.exists else (0, 0.0, "")
        )
        for pdf in pdf_iter:
            count += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_type = str(
                    pdf.sort_values("ts")["event_type"].iloc[-1]
                )
        state.update((count, total, last_type))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "total_value": [total],
                "last_type": [last_type],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, "
        "total_value double, last_type string",
        stateStructType="count bigint, total double, last_type string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

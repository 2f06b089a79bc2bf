"""Incremental / CDC layer (SURVEY.md §2.9).

The reference's "streaming" is micro-batch CDC over snapshot-versioned
tables — streams (changelog views), tasks (scheduled SQL with
``WHEN stream_has_data``), dynamic tables (auto-refreshed MVs), and AT
time travel. No watermarks/event-time exist in the reference; Spark
Structured Streaming (``databend_spark.streaming.structured``) is extra
capability on top.

Components:
  * ``VersionedTable`` — parquet + JSON snapshot log (the Fuse
    snapshot→segments→blocks analog, append-only mode).
  * ``Stream`` — changelog view between consumed and current version
    with transactional consumption.
  * ``Task`` / ``TaskRunner`` — scheduled SQL DAG with WHEN conditions.
  * ``DynamicTable`` — target-lag refreshed materialization.
"""

from databend_spark.streaming.incremental import (
    DynamicTable,
    Stream,
    Task,
    TaskRunner,
    VersionedTable,
)

__all__ = ["VersionedTable", "Stream", "Task", "TaskRunner", "DynamicTable"]

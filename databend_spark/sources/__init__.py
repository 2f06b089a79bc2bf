"""File-format sources & stages (SURVEY.md §2.1)."""

from databend_spark.sources.readers import (
    FORMATS,
    infer_schema,
    read_stage,
    write_stage,
)

__all__ = ["FORMATS", "read_stage", "write_stage", "infer_schema"]

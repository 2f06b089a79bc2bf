"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1) at sf0.001.
``queries()`` / ``oracle_sql()`` — the full operator suite from
``databend_spark.suite`` (one entry per SURVEY.md §2 item).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from databend_spark.suite import oracle_sql as _oracle_sql
from databend_spark.suite import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _queries()["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()

"""Function compatibility layer: Databend names → Spark implementations.

See ``registry`` for the alias map and composed functions, ``vector`` for
vector distance functions, ``aggregates`` for funnel/retention.
"""

from databend_spark.functions.registry import databend_fn, rewrite_function_names

__all__ = ["databend_fn", "rewrite_function_names"]

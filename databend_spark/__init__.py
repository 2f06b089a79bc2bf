"""databend_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of databendlabs/databend.

Architecture (SURVEY.md §7): one IR — Catalyst's. We provide
  * a bendpy-style session/catalog surface (``SessionContext``),
  * a function/semantics compatibility layer (``functions``),
  * operators Spark lacks (as-of join, recursive CTE, dedup/minhash,
    ANN similarity, funnel/retention aggregates) built Spark-first,
  * an incremental layer (streams / tasks / dynamic tables), and
  * the LLM-data-pipeline operator suite (dedup, similarity search,
    text analysis, multimodal plumbing).

Reference parity evidence is cited per-module as /root/reference file:line.
"""

from databend_spark.session import SessionContext, get_spark

__all__ = ["SessionContext", "get_spark"]
__version__ = "0.1.0"

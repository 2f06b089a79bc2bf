"""sqllogictest-format runner (SURVEY.md §5).

The reference's primary test corpus is sqllogictest files
(``/root/reference/tests/sqllogictests/``). This runner executes the
same ``.test`` format against the engine so engine-neutral suites (the
DuckDB-ported ones) validate our SQL semantics directly.
"""

from databend_spark.testkit.runner import SLTReport, run_slt_file

__all__ = ["run_slt_file", "SLTReport"]

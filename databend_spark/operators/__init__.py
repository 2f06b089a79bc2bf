"""Operators Spark lacks natively, built Spark-first (SURVEY.md §2.3, §7).

Each is a composition of DataFrame ops where semantics allow; Pandas-UDF
paths only where built-ins genuinely can't express the operator.
"""

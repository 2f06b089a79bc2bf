"""Databend-SQL → Spark-SQL rewrites (SURVEY.md §7.4).

Spark SQL already accepts ~90% of Databend's surface (ANSI core, `::`
casts since 3.4, QUALIFY is the notable gap). We keep a small, explicit
pre-parse rewrite list instead of a full transpiler, and raise a clear
error for constructs we know we don't support rather than mis-parsing.

Reference dialect evidence: parser at
``/root/reference/src/query/ast/src/parser/parser.rs``; Databend-only
syntax like ``AT (...)`` time travel (``ast/query.rs:568``) and
``CHANGES`` (``ast/query.rs:724``) are handled by the incremental layer,
not plain SQL.
"""

from __future__ import annotations

import re

_UNSUPPORTED = [
    (re.compile(r"\bCHANGES\s*\(", re.I),
     "CHANGES(...) — use databend_spark.streaming.VersionedTable.changes()"),
    (re.compile(r"\bAT\s*\(\s*(SNAPSHOT|TIMESTAMP|OFFSET|STREAM)\b", re.I),
     "AT(...) time travel — use databend_spark.streaming.VersionedTable.read()"),
    (re.compile(r"\bQUALIFY\b", re.I),
     "QUALIFY — wrap the query in a subselect and filter the window "
     "column in the outer WHERE (Spark SQL has no QUALIFY)"),
]

# positional tuple access  t.1  →  t._1? Databend tuples map to Spark structs
# with positional field names `1`,`2`… which Spark needs backquoted.
_TUPLE_FIELD = re.compile(r"(\w)\.(\d+)\b")

_QUALIFY = re.compile(r"\bQUALIFY\b", re.I)
_NUMBERS_TVF = re.compile(r"\bnumbers\s*\(\s*(\d+)\s*\)", re.I)

# type-name aliases (Databend unsigned/width names + common dialect
# spellings) → Spark types; unsigned widen per SURVEY §1.2
_TYPE_ALIASES = [
    (re.compile(r"\bUTINYINT\b", re.I), "SMALLINT"),
    (re.compile(r"\bUSMALLINT\b", re.I), "INT"),
    (re.compile(r"\bUINTEGER\b", re.I), "BIGINT"),
    (re.compile(r"\bUBIGINT\b", re.I), "DECIMAL(20,0)"),
    (re.compile(r"\bUINT8\b", re.I), "SMALLINT"),
    (re.compile(r"\bUINT16\b", re.I), "INT"),
    (re.compile(r"\bUINT32\b", re.I), "BIGINT"),
    (re.compile(r"\bUINT64\b", re.I), "DECIMAL(20,0)"),
    (re.compile(r"\bINT8\b", re.I), "BIGINT"),
    (re.compile(r"\bINT4\b", re.I), "INT"),
    (re.compile(r"\bINT2\b", re.I), "SMALLINT"),
    (re.compile(r"\bINT1\b", re.I), "TINYINT"),
    (re.compile(r"\bHUGEINT\b", re.I), "DECIMAL(38,0)"),
    (re.compile(r"\bFLOAT4\b", re.I), "FLOAT"),
    (re.compile(r"\bFLOAT8\b", re.I), "DOUBLE"),
    (re.compile(r"\bVARCHAR\b(?!\s*\()", re.I), "STRING"),
    (re.compile(r"\bBOOL\b", re.I), "BOOLEAN"),
    # TEXT only in type position (cast syntax) — `text` is a common
    # column name and must not be rewritten
    (re.compile(r"::\s*TEXT\b", re.I), "::STRING"),
    (re.compile(r"\bAS\s+TEXT\s*\)", re.I), "AS STRING)"),
    (re.compile(r"\bBYTEA\b", re.I), "BINARY"),
]
_DDL_TEXT = re.compile(r"\bTEXT\b", re.I)

# Databend-only table options in DDL (fuse-engine knobs) — no Spark analog
_DDL_OPTIONS = [
    re.compile(r"\bENGINE\s*=\s*\w+", re.I),
    re.compile(r"\bCLUSTER\s+BY\s*\([^)]*\)", re.I),
    re.compile(
        r"\b(row_per_block|block_per_segment|block_size_threshold|"
        r"bloom_index_columns|storage_format|compression|data_retention_period_in_hours)"
        r"\s*=\s*('[^']*'|\d+|\w+)",
        re.I,
    ),
]
# `settings (k = v[, ...])` statement prefix (per-query session settings)
_SETTINGS_PREFIX = re.compile(r"^\s*settings\s*\([^)]*\)\s*", re.I)
_COUNT_EMPTY = re.compile(r"\bcount\s*\(\s*\)", re.I)
_CREATE_TABLE = re.compile(r"\s*CREATE\s+(OR\s+REPLACE\s+)?(TEMP\w*\s+)?TABLE", re.I)
_DDL_NULL = re.compile(r"(?<!NOT)\s+NULL(?=\s*[,)])", re.I)


class UnsupportedSQL(Exception):
    pass


_STRING_LIT = re.compile(r"'(?:[^']|'')*'")


def _mask_strings(sql: str) -> tuple[str, list[str]]:
    """Replace string literals with placeholders so regex rewrites never
    touch literal content."""
    literals: list[str] = []

    def stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    return _STRING_LIT.sub(stash, sql), literals


def _unmask_strings(sql: str, literals: list[str]) -> str:
    for i, lit in enumerate(literals):
        sql = sql.replace(f"\x00{i}\x00", lit)
    return sql


def rewrite_databend_sql(sql: str) -> str:
    """Rewrite the Databend-only constructs we support; raise a clear
    error on the ones we don't (never silently mis-parse)."""
    masked, literals = _mask_strings(sql)
    masked = masked.rstrip()
    while masked.endswith(";"):
        masked = masked[:-1].rstrip()
    for pat, msg in _UNSUPPORTED:
        if pat.search(masked):
            raise UnsupportedSQL(f"unsupported Databend syntax: {msg}")
    for pat, repl in _TYPE_ALIASES:
        masked = pat.sub(repl, masked)
    # Databend positional tuple access `t.1` → Spark struct field `t.`1``
    masked = _TUPLE_FIELD.sub(r"\1.`\2`", masked)
    # numbers(N) table function → range(N) with the reference column name
    masked = _NUMBERS_TVF.sub(r"(SELECT id AS number FROM range(\1))", masked)
    # zero-arg count() → count(*)
    masked = _COUNT_EMPTY.sub("count(*)", masked)
    # per-query settings prefix → engine defaults apply
    masked = _SETTINGS_PREFIX.sub("", masked)
    # explicit `NULL` nullability marker in DDL (Spark only knows NOT NULL)
    if _CREATE_TABLE.match(masked):
        masked = _DDL_NULL.sub("", masked)
        masked = _DDL_TEXT.sub("STRING", masked)
        for pat in _DDL_OPTIONS:
            masked = pat.sub("", masked)
    # Databend function aliases → Spark names + expression macros
    from databend_spark.functions.registry import (
        expand_sql_macros,
        rewrite_function_names,
    )

    masked = rewrite_function_names(masked)
    masked = expand_sql_macros(masked)
    return _unmask_strings(masked, literals)


def has_qualify(sql: str) -> bool:
    return bool(_QUALIFY.search(sql))

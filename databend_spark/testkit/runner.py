"""Minimal sqllogictest runner for the reference's .test files.

Format (sqllogictest-rs dialect, as used by
``/root/reference/tests/sqllogictests/README.md``):

    statement ok
    <sql>

    statement error <code-or-pattern>
    <sql>

    query <type-chars> [rowsort|valuesort]
    <sql>
    ----
    <expected rows, one per line, columns space/tab separated>

Directives handled: comments (#), ``onlyif``/``skipif`` (we answer to
dialect names ``spark`` and ``databend_spark``; blocks gated to other
engines are skipped), ``control`` / ``halt`` ignored-safe.

Comparison: row-wise; numeric cells compare with tolerance 1e-6 (float
formatting differs across engines), NULL ↔ "NULL", empty string ↔
"(empty)", booleans accept 0/1/true/false.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

OUR_NAMES = {"spark", "databend_spark", "databend"}


@dataclass
class SLTReport:
    path: str
    passed: int = 0
    failed: int = 0
    skipped: int = 0
    failures: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.failed == 0


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    s = str(v)
    return "(empty)" if s == "" else s


def _cells_match(exp: str, got: str) -> bool:
    if exp == got:
        return True
    if {exp.lower(), got.lower()} <= {"0", "false"} or {
        exp.lower(),
        got.lower(),
    } <= {"1", "true"}:
        return True
    try:
        return math.isclose(float(exp), float(got), rel_tol=1e-6, abs_tol=1e-6)
    except ValueError:
        return False


def _rows_match(expected: list[list[str]], actual: list[list[str]]) -> bool:
    if len(expected) != len(actual):
        return False
    for er, ar in zip(expected, actual):
        if len(er) != len(ar):
            return False
        if not all(_cells_match(e, a) for e, a in zip(er, ar)):
            return False
    return True


_SETTINGS_STMT = re.compile(r"^\s*(un)?set\s+\w+", re.I)


def run_slt_file(
    spark: SparkSession,
    path: str,
    skip_patterns: list[str] | None = None,
    isolate: bool = True,
) -> SLTReport:
    from databend_spark.sqlgen import rewrite_databend_sql

    _or_replace_tbl = re.compile(
        r"^\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+([\w.]+)", re.I
    )
    _or_replace_db = re.compile(
        r"^\s*CREATE\s+OR\s+REPLACE\s+DATABASE\s+([\w.]+)", re.I
    )

    def run_sql(sql: str):
        # Spark v1 tables have no OR REPLACE — emulate with a pre-drop
        m = _or_replace_tbl.match(sql)
        if m:
            spark.sql(f"DROP TABLE IF EXISTS {m.group(1)}")
            sql = re.sub(r"OR\s+REPLACE\s+", "", sql, count=1, flags=re.I)
        m = _or_replace_db.match(sql)
        if m:
            spark.sql(f"DROP DATABASE IF EXISTS {m.group(1)} CASCADE")
            sql = re.sub(r"OR\s+REPLACE\s+", "", sql, count=1, flags=re.I)
        rewritten = rewrite_databend_sql(sql)
        try:
            return spark.sql(rewritten)
        except Exception as e:  # noqa: BLE001
            # a killed run can leave orphan table dirs the catalog no
            # longer tracks — remove the stale location and retry once
            msg = str(e)
            loc = re.search(r"location 'file:([^']+)' already exists", msg)
            if "LOCATION_ALREADY_EXISTS" in msg and loc:
                import shutil

                shutil.rmtree(loc.group(1), ignore_errors=True)
                return spark.sql(rewritten)
            raise

    if isolate:  # fresh database per file — files reuse table names
        db = "slt_" + re.sub(r"\W", "_", path.rsplit("/", 2)[-1])[:40].lower()
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        # a previously-killed run can leave orphan table dirs the catalog
        # no longer tracks — LOCATION_ALREADY_EXISTS on re-create
        import shutil

        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(warehouse, f"{db}.db"), ignore_errors=True)
        spark.sql(f"CREATE DATABASE {db}")
        spark.sql(f"USE {db}")
        try:
            return run_slt_file(spark, path, skip_patterns, isolate=False)
        finally:
            spark.sql("USE default")
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")

    rep = SLTReport(path=path)
    with open(path) as f:
        lines = f.read().splitlines()

    i, n = 0, len(lines)
    skip_res = [re.compile(p, re.I) for p in (skip_patterns or [])]

    def read_sql(start: int, stop_at_dashes: bool) -> tuple[str, int]:
        buf = []
        j = start
        while j < n and lines[j].strip() != "" and not (
            stop_at_dashes and lines[j].strip() == "----"
        ):
            buf.append(lines[j])
            j += 1
        return "\n".join(buf), j

    pending_skip = False
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        low = line.lower()
        if low.startswith(("onlyif", "skipif")):
            target = low.split()[-1]
            if (low.startswith("onlyif") and target not in OUR_NAMES) or (
                low.startswith("skipif") and target in OUR_NAMES
            ):
                pending_skip = True
            i += 1
            continue
        if low.startswith(("control", "halt", "hash-threshold")):
            i += 1
            continue

        if low.startswith("statement"):
            expect_error = "error" in low.split()
            sql, i = read_sql(i + 1, stop_at_dashes=False)
            if pending_skip or any(r.search(sql) for r in skip_res):
                pending_skip = False
                rep.skipped += 1
                continue
            if _SETTINGS_STMT.match(sql):
                rep.skipped += 1  # engine-specific session settings
                continue
            try:
                run_sql(sql).collect()
                err = None
            except Exception as e:  # noqa: BLE001
                err = e
            if expect_error and err is None:
                rep.failed += 1
                rep.failures.append(f"expected error, got success: {sql[:120]}")
            elif not expect_error and err is not None:
                rep.failed += 1
                rep.failures.append(f"statement failed: {sql[:120]} :: {err}")
            else:
                rep.passed += 1
            continue

        if low.startswith("query"):
            header = line.split()
            ncols = len(header[1]) if len(header) > 1 else 0
            sortmode = header[2] if len(header) > 2 else ""
            sql, i = read_sql(i + 1, stop_at_dashes=True)
            expected: list[list[str]] = []
            if i < n and lines[i].strip() == "----":
                i += 1
                while i < n and lines[i].strip() != "":
                    # split into exactly ncols cells — only the last
                    # column may contain embedded whitespace
                    cells = (
                        re.split(r"\s+", lines[i].strip(), maxsplit=ncols - 1)
                        if ncols > 0
                        else re.split(r"\s+", lines[i].strip())
                    )
                    expected.append(cells)
                    i += 1
            if pending_skip or any(r.search(sql) for r in skip_res):
                pending_skip = False
                rep.skipped += 1
                continue
            try:
                rows = run_sql(sql).collect()
            except Exception as e:  # noqa: BLE001
                rep.failed += 1
                rep.failures.append(f"query failed: {sql[:120]} :: {e}")
                continue
            actual = [[_norm_cell(v) for v in row] for row in rows]
            exp = expected
            if sortmode == "rowsort" or not sortmode:
                # reference runner sorts both sides unless results are
                # guaranteed ordered; sorting both is the safe compare
                actual = sorted(actual)
                exp = sorted(exp)
            if _rows_match(exp, actual):
                rep.passed += 1
            else:
                rep.failed += 1
                rep.failures.append(
                    f"mismatch: {sql[:120]} expected={exp[:4]} got={actual[:4]}"
                )
            continue

        i += 1  # unknown directive
    return rep

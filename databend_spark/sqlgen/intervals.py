"""Databend INTERVAL literal folding (reference
src/query/functions/src/scalars/timestamp/src/interval.rs and
src/query/expression/src/types/interval.rs: months_days_micros model,
PostgreSQL-style text rendering, justify-to-microseconds comparison
with 30-day months).

Everything here runs at SQL-rewrite time: to_interval('…') and the
to_years/to_hours/… constructors take literal arguments in the
reference tests, so parsing, rendering, arithmetic desugaring, and
comparisons fold to plain Spark SQL with no runtime UDF.
"""

from __future__ import annotations

import re

_UNIT_MONTHS = {
    "millennium": 12000, "millenniums": 12000, "millennia": 12000,
    "century": 1200, "centuries": 1200,
    "decade": 120, "decades": 120,
    "year": 12, "years": 12, "y": 12,
    "quarter": 3, "quarters": 3,
    "month": 1, "months": 1, "mon": 1, "mons": 1,
}
_UNIT_DAYS = {"week": 7, "weeks": 7, "w": 7, "day": 1, "days": 1, "d": 1}
_UNIT_MICROS = {
    "hour": 3_600_000_000, "hours": 3_600_000_000, "h": 3_600_000_000,
    "minute": 60_000_000, "minutes": 60_000_000, "min": 60_000_000,
    "mins": 60_000_000,
    "second": 1_000_000, "seconds": 1_000_000, "s": 1_000_000,
    "millisecond": 1_000, "milliseconds": 1_000, "ms": 1_000,
    "microsecond": 1, "microseconds": 1, "us": 1, "micros": 1,
    "microsecon": 1,
}

_ISO = re.compile(
    r"^([+-])?P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$",
    re.I,
)


def parse_interval(text: str) -> tuple[int, int, int]:
    """(months, days, micros); raises ValueError on malformed input."""
    t = text.strip()
    iso = _ISO.match(t)
    if iso and t.upper().lstrip("+-").startswith("P"):
        sign = -1 if iso.group(1) == "-" else 1
        months = int(iso.group(2) or 0) * 12 + int(iso.group(3) or 0)
        days = int(iso.group(4) or 0) * 7 + int(iso.group(5) or 0)
        sec = iso.group(8) or "0"
        if "." in sec and len(sec.split(".")[1]) > 6:
            raise ValueError("interval precision beyond microseconds")
        micros = (
            int(iso.group(6) or 0) * 3_600_000_000
            + int(iso.group(7) or 0) * 60_000_000
            + round(float(sec) * 1_000_000)
        )
        return sign * months, sign * days, sign * micros
    toks = t.lower().split()
    sign = 1
    if toks and toks[-1] == "ago":
        sign = -1
        toks = toks[:-1]
    if not toks or len(toks) % 2:
        raise ValueError(f"malformed interval: {text!r}")
    months = days = micros = 0
    for i in range(0, len(toks), 2):
        try:
            n = float(toks[i]) if "." in toks[i] else int(toks[i])
        except ValueError as e:
            raise ValueError(f"malformed interval: {text!r}") from e
        u = toks[i + 1]
        # a group that overflows the storage width is SWALLOWED, not an
        # error (reference interval.rs from_cstring: `let _ =
        # apply_specifier(...)` — '120000000000 months' → 00:00:00)
        if u in _UNIT_MONTHS:
            v = int(n * _UNIT_MONTHS[u])
            if abs(v) <= 2**31 - 1 and abs(months + v) <= 2**31 - 1:
                months += v
        elif u in _UNIT_DAYS:
            v = int(n * _UNIT_DAYS[u])
            if abs(v) <= 2**31 - 1 and abs(days + v) <= 2**31 - 1:
                days += v
        elif u in _UNIT_MICROS:
            v = round(n * _UNIT_MICROS[u])
            if abs(v) <= 2**63 - 1 and abs(micros + v) <= 2**63 - 1:
                micros += v
        else:
            raise ValueError(f"unknown interval unit {u!r}")
    return sign * months, sign * days, sign * micros


def render_interval(months: int, days: int, micros: int) -> str:
    """PostgreSQL interval_out text: '1 year 2 months 3 days 4:05:06'."""
    parts: list[str] = []
    years, months = int(months / 12), months - int(months / 12) * 12
    if years:
        parts.append(f"{years} year" + ("s" if abs(years) != 1 else ""))
    if months:
        parts.append(f"{months} month" + ("s" if abs(months) != 1 else ""))
    if days:
        parts.append(f"{days} day" + ("s" if abs(days) != 1 else ""))
    if not parts and not micros:
        return "00:00:00"  # all-zero special case (interval.rs:132)
    if micros or not parts:
        neg = micros < 0
        us = abs(micros)
        h, us = divmod(us, 3_600_000_000)
        m, us = divmod(us, 60_000_000)
        s, us = divmod(us, 1_000_000)
        t = f"{h}:{m:02d}:{s:02d}"
        if us:
            t += f".{us:06d}"
        parts.append(("-" if neg else "") + t)
    return " ".join(parts)


def interval_key(months: int, days: int, micros: int) -> int:
    """Comparison key: 30-day months, 24-hour days (reference
    interval comparison justifies to microseconds)."""
    return (months * 30 + days) * 86_400_000_000 + micros


_TO_INTERVAL = (
    r"(?:to_interval\s*\(\s*'([^']*)'\s*\)"
    r"|interval\s+'([^']*)'"
    r"|to_(millennia|centuries|decades|years|quarters|months|weeks"
    r"|days|hours|minutes|seconds|milliseconds|microseconds)"
    r"\s*\(\s*(-?\d+(?:\.\d+)?)\s*\))"
)
_CTOR_UNIT = {
    "millennia": "millennium", "centuries": "century",
    "decades": "decade", "years": "year", "quarters": "quarter",
    "months": "month", "weeks": "week", "days": "day", "hours": "hour",
    "minutes": "minute", "seconds": "second",
    "milliseconds": "millisecond", "microseconds": "microsecond",
}
_CMP = r"(=|!=|<>|>=|<=|>|<)"
_ARITH_RE = re.compile(r"([+-])\s*" + _TO_INTERVAL, re.I)
_CMP_RE = re.compile(
    _TO_INTERVAL + r"\s*" + _CMP + r"\s*" + _TO_INTERVAL, re.I
)
_BARE_RE = re.compile(_TO_INTERVAL, re.I)


def _mdu(groups: tuple, base: int = 0) -> tuple[int, int, int] | None:
    lit = groups[base] if groups[base] is not None else groups[base + 1]
    if lit is not None:
        return parse_interval(lit)
    unit, n = groups[base + 2], groups[base + 3]
    if unit is None:
        return None
    return parse_interval(f"{n} {_CTOR_UNIT[unit.lower()]}")


def rewrite_intervals(sql: str) -> str:
    """Fold literal interval expressions into plain Spark SQL:
    arithmetic → chained single-unit INTERVAL literals, comparisons →
    precomputed keys, standalone → the rendered text literal."""

    def arith(m: re.Match) -> str:
        try:
            mo, d, us = _mdu(m.groups(), 1)
        except (ValueError, TypeError):
            return m.group(0)
        flip = -1 if m.group(1) == "-" else 1
        pieces = []
        for n, unit in ((mo, "months"), (d, "days"), (us, "microseconds")):
            if n:
                n *= flip
                op = "+" if n >= 0 else "-"
                # \x03 keeps the bare-literal pass off this emission;
                # the macro expander strips it at the end
                pieces.append(f" {op} INTERVA\x03L '{abs(n)} {unit}'")
        return "".join(pieces) or " + INTERVA\x03L '0 seconds'"

    def cmp(m: re.Match) -> str:
        g = m.groups()
        try:
            a = interval_key(*_mdu(g, 0))
            b = interval_key(*_mdu(g, 5))
        except (ValueError, TypeError):
            return m.group(0)
        return f"{a} {g[4]} {b}"

    def bare(m: re.Match) -> str:
        try:
            mo, d, us = _mdu(m.groups())
        except (ValueError, TypeError):
            return m.group(0)
        return "'" + render_interval(mo, d, us) + "'"

    # function-call arithmetic plus(x, <interval>) → operator form
    sql = re.sub(
        r"\bplus\s*\(((?:[^(),']|'[^']*'|\([^()]*\))+),\s*"
        r"(to_interval\s*\([^()]*\)|interval\s+'[^']*')\s*\)",
        r"(\1 + \2)",
        sql,
        flags=re.I,
    )
    # to_month(<interval>) extracts the month component
    def month_of(m: re.Match) -> str:
        try:
            mo, _d, _us = _mdu(m.groups())
        except (ValueError, TypeError):
            return m.group(0)
        return str(mo - int(mo / 12) * 12)

    sql = re.sub(
        r"\bto_month\s*\(\s*" + _TO_INTERVAL + r"\s*\)",
        month_of,
        sql,
        flags=re.I,
    )
    # <interval> + <ts/date operand> → swap to operand-first so the
    # chained-INTERVAL arith pass below applies
    sql = re.sub(
        r"(?<![\w`])\(?\s*(" + _TO_INTERVAL + r")\s*\)?\s*\+\s*"
        r"((?:TIMESTAMP(?:_TZ)?|DATE)\s*'[^']*'|[\w.`]+"
        r"(?:\s*\(\s*[^()]*\))?(?:\s*::\s*\w+)?)",
        r"\6 + \1",
        sql,
        flags=re.I,
    )
    sql = _CMP_RE.sub(cmp, sql)
    sql = _ARITH_RE.sub(arith, sql)
    return _BARE_RE.sub(bare, sql)

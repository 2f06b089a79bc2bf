"""INTERVAL and TIMESTAMP_TZ scalar surface.

The reference models INTERVAL as (months, days, micros) with a
Postgres-style text form (src/common/io/src/interval.rs: Interval::
from_string / IntervalToStringCast::format) and TIMESTAMP WITH TIME
ZONE as an instant plus the ORIGINAL utc offset, displayed as
``yyyy-MM-dd HH:mm:ss.ffffff ±HHMM`` (src/query/expression/src/types/
timestamp_tz.rs). Spark has neither type natively — TimestampType
normalizes to the session zone and CalendarIntervalType has no SQL
text round-trip — so the dialect layer carries both as canonical TEXT
and rewrites comparisons through the epoch-micros parse. These
functions are dialect surface for SLT parity, not analytic hot paths.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

MICROS_PER_SEC = 1_000_000
MICROS_PER_MIN = 60 * MICROS_PER_SEC
MICROS_PER_HOUR = 60 * MICROS_PER_MIN

_SPECIFIER_MONTHS = {
    "millennium": 12000, "millennia": 12000,
    "century": 1200, "centuries": 1200,
    "decade": 120, "decades": 120,
    "year": 12, "years": 12, "y": 12,
    "quarter": 3, "quarters": 3,
    "month": 1, "months": 1, "mon": 1,
}
_SPECIFIER_DAYS = {"day": 1, "days": 1, "d": 1, "week": 7, "weeks": 7, "w": 7}
_SPECIFIER_MICROS = {
    "microsecond": 1, "microseconds": 1, "us": 1,
    "millisecond": 1000, "milliseconds": 1000, "ms": 1000,
    "second": MICROS_PER_SEC, "seconds": MICROS_PER_SEC, "s": MICROS_PER_SEC,
    "minute": MICROS_PER_MIN, "minutes": MICROS_PER_MIN, "m": MICROS_PER_MIN,
    "hour": MICROS_PER_HOUR, "hours": MICROS_PER_HOUR, "h": MICROS_PER_HOUR,
}


def interval_parse(s: str) -> tuple[int, int, int]:
    """Parse interval text → (months, days, micros).

    Reimplements the reference's Postgres-compatible grammar
    (interval.rs from_cstring): signed ``<number>[.<frac>] <specifier>``
    groups, ``H[:MM[:SS[.ffffff]]]`` time parts, optional ``@`` prefix
    and trailing ``ago``; fractions only contribute for the bare-micros
    (empty) specifier. ISO-8601 ``P…`` durations handled for the common
    Y/M/W/D/H/M/S fields."""
    if s is None:
        raise ValueError("NULL interval")
    t = s.strip()
    if not t:
        raise ValueError("Empty string")
    if t.startswith("@"):
        t = t[1:].lstrip()
    m_iso = re.match(r"^[-+]?[Pp]", t)
    if m_iso:
        return _parse_iso8601(t)
    months = days = micros = 0
    pos, n, found = 0, len(t), False
    while pos < n:
        ch = t[pos]
        if ch in " \t\n":
            pos += 1
            continue
        sign = 1
        if ch == "-":
            sign = -1
            pos += 1
        elif ch == "+":
            pos += 1
        elif ch in "aA":
            if t[pos : pos + 3].lower() != "ago" or t[pos + 3 :].strip():
                raise ValueError("Invalid 'ago' specifier")
            return (-months, -days, -micros)
        elif not ch.isdigit():
            raise ValueError(f"Unexpected character at position {pos}")
        m_num = re.match(r"(\d+)(?:\.(\d+))?", t[pos:])
        if not m_num:
            raise ValueError("Expected number")
        number = int(m_num.group(1))
        frac_digits = m_num.group(2) or ""
        pos += m_num.end()
        # H:MM[:SS[.ffffff]] time part
        if pos < n and t[pos] == ":" and not frac_digits:
            total = number * MICROS_PER_HOUR
            parts = re.match(
                r":(\d+)(?::(\d+)(?:\.(\d+))?)?", t[pos:]
            )
            if not parts:
                raise ValueError("Expected number after ':'")
            total += int(parts.group(1)) * MICROS_PER_MIN
            if parts.group(2) is not None:
                total += int(parts.group(2)) * MICROS_PER_SEC
            if parts.group(3):
                total += int(parts.group(3)[:6].ljust(6, "0"))
            micros += sign * total
            pos += parts.end()
            found = True
            continue
        m_spec = re.match(r"\s*([A-Za-z]*)", t[pos:])
        spec = m_spec.group(1).lower()
        pos += m_spec.end()
        found = True
        # overflow SWALLOWS the group (reference from_cstring uses
        # `let _ = apply_specifier(...)` — '120000000000 months' parses
        # as the empty interval, 02_0079 golden '00:00:00')
        _I32 = 2**31 - 1
        _I64 = 2**63 - 1
        if not spec:
            micros += sign * number
            if frac_digits:
                micros += sign * int(frac_digits[:6].ljust(6, "0")[:6])
        elif spec in _SPECIFIER_MONTHS:
            v = number * _SPECIFIER_MONTHS[spec]
            if abs(v) <= _I32 and abs(months + sign * v) <= _I32:
                months += sign * v
        elif spec in _SPECIFIER_DAYS:
            v = number * _SPECIFIER_DAYS[spec]
            if abs(v) <= _I32 and abs(days + sign * v) <= _I32:
                days += sign * v
        elif spec in _SPECIFIER_MICROS:
            v = number * _SPECIFIER_MICROS[spec]
            if abs(v) <= _I64 and abs(micros + sign * v) <= _I64:
                micros += sign * v
        else:
            raise ValueError(f"Invalid date part specifier: {spec}")
    if not found:
        raise ValueError("No interval specifiers found")
    return (months, days, micros)


def _parse_iso8601(t: str) -> tuple[int, int, int]:
    neg = t.startswith("-")
    t = t.lstrip("+-")
    m = re.match(
        r"^[Pp](?:(\d+)[Yy])?(?:(\d+)[Mm])?(?:(\d+)[Ww])?(?:(\d+)[Dd])?"
        r"(?:[Tt](?:(\d+)[Hh])?(?:(\d+)[Mm])?(?:(\d+(?:\.\d+)?)[Ss])?)?$",
        t,
    )
    if not m:
        raise ValueError("Invalid ISO 8601 duration")
    y, mo, w, d, h, mi, se = m.groups()
    months = int(y or 0) * 12 + int(mo or 0)
    days = int(w or 0) * 7 + int(d or 0)
    micros = int(h or 0) * MICROS_PER_HOUR + int(mi or 0) * MICROS_PER_MIN
    if se:
        if "." in se and len(se.split(".")[1]) > 6:
            # sub-microsecond precision is unrepresentable
            # (reference jiff Span → micros conversion errors)
            raise ValueError("nanosecond precision not supported")
        micros += int(float(se) * MICROS_PER_SEC)
    if neg:
        return (-months, -days, -micros)
    return (months, days, micros)


def interval_format(months: int, days: int, micros: int) -> str:
    """Render (months, days, micros) exactly like the reference
    (interval.rs IntervalToStringCast::format): ``N year(s) N month(s)
    N day(s) H:MM:SS[.ffffff]``, zero components omitted, ``00:00:00``
    when everything is zero."""
    out: list[str] = []

    def _val(value: int, name: str) -> None:
        if value == 0:
            return
        plural = "s" if value not in (1, -1) else ""
        out.append(f"{value} {name}{plural}")

    if months != 0:
        years = int(months / 12)  # trunc toward zero like Rust i32 div
        _val(years, "year")
        _val(months - years * 12, "month")
    if days != 0:
        _val(days, "day")
    if micros != 0:
        neg = "-" if micros < 0 else ""
        mu = abs(micros)
        hour, mu = divmod(mu, MICROS_PER_HOUR)
        minute, mu = divmod(mu, MICROS_PER_MIN)
        sec, mu = divmod(mu, MICROS_PER_SEC)
        txt = f"{neg}{hour}:{minute:02d}:{sec:02d}"
        if mu:
            txt += "." + f"{mu:06d}".rstrip("0")
        out.append(txt)
    elif not out:
        return "00:00:00"
    return " ".join(out)


def interval_text(s: str | None) -> str | None:
    """to_interval(text) → canonical interval display."""
    if s is None:
        return None
    return interval_format(*interval_parse(s))


def interval_compare_key(s: str | None) -> int | None:
    """Total-order key matching the reference's interval comparison
    (months_days_micros: months→30-day equivalence like Postgres)."""
    if s is None:
        return None
    months, days, micros = interval_parse(s)
    return (months * 30 + days) * 86_400_000_000 + micros


_TS_RE = re.compile(
    r"^\s*(\d{1,4})-(\d{1,2})-(\d{1,2})"
    r"(?:[ T](\d{1,2})(?::(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?)?)?"
    r"\s*(?:(Z)|([+-])(\d{2}):?(\d{2})?)?\s*$"
)


def _parse_ts_tz_auto(s: str):
    """Auto-detect fallback shapes (reference
    enable_auto_detect_datetime_format; 02_0012): RFC 2822, Unix date,
    DD-MON-YYYY. → (naive datetime, offset minutes or None)."""
    txt = s.strip()
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(txt)
        off = dt.utcoffset()
        off_min = (
            int(off.total_seconds() // 60) if off is not None else None
        )
        return dt.replace(tzinfo=None), off_min
    except Exception:  # noqa: BLE001
        pass
    import re as _re

    m = _re.match(
        r"^(\d{1,2})-([A-Za-z]{3})-(\d{4})"
        r"(?:[ T](\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?)?$",
        txt,
    )
    if m:
        months = {
            "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5,
            "jun": 6, "jul": 7, "aug": 8, "sep": 9, "oct": 10,
            "nov": 11, "dec": 12,
        }
        mo = months.get(m.group(2).lower())
        if mo:
            frac = (m.group(7) or "")[:6].ljust(6, "0")
            try:
                return (
                    datetime(
                        int(m.group(3)), mo, int(m.group(1)),
                        int(m.group(4) or 0), int(m.group(5) or 0),
                        int(m.group(6) or 0), int(frac) if frac else 0,
                    ),
                    None,
                )
            except ValueError:
                return None
    return None


def _parse_ts_tz(s: str, session_tz: str, auto: bool = False) -> tuple[datetime, int] | None:
    """→ (aware datetime, original offset minutes). Missing offset →
    the session zone's offset at that local time (reference: TIMESTAMP_TZ
    binds the settings timezone at parse)."""
    m = _TS_RE.match(s)
    if not m:
        if auto:
            got = _parse_ts_tz_auto(s)
            if got is None:
                return None
            naive, off_min = got
            if off_min is None:
                try:
                    from zoneinfo import ZoneInfo

                    zone = ZoneInfo(session_tz or "UTC")
                except Exception:  # noqa: BLE001
                    zone = timezone.utc
                localized = naive.replace(tzinfo=zone)
                off = localized.utcoffset() or timedelta(0)
                off_min = int(off.total_seconds() // 60)
            aware = naive.replace(
                tzinfo=timezone(timedelta(minutes=off_min))
            )
            return aware, off_min
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    frac = (m.group(7) or "")[:6].ljust(6, "0")
    us = int(frac) if frac else 0
    try:
        naive = datetime(y, mo, d, hh, mi, ss, us)
    except ValueError:
        return None
    if m.group(8):  # Z
        off_min = 0
    elif m.group(9):
        off_min = int(m.group(10)) * 60 + int(m.group(11) or 0)
        if m.group(9) == "-":
            off_min = -off_min
    else:
        try:
            from zoneinfo import ZoneInfo

            zone = ZoneInfo(session_tz or "UTC")
        except Exception:  # noqa: BLE001
            zone = timezone.utc
        localized = naive.replace(tzinfo=zone)
        off = localized.utcoffset() or timedelta(0)
        off_min = int(off.total_seconds() // 60)
    aware = naive.replace(tzinfo=timezone(timedelta(minutes=off_min)))
    return aware, off_min


def timestamp_tz_text(
    s: str | None,
    session_tz: str | None = "UTC",
    auto: bool = False,
    soft: bool = False,
) -> str | None:
    """to_timestamp_tz / ::TIMESTAMP_TZ display:
    ``yyyy-MM-dd HH:mm:ss.ffffff ±HHMM`` preserving the written offset
    (reference timestamp_tz display format). ``auto`` adds the
    detection fallbacks; ``soft`` returns NULL instead of raising
    (try_to_timestamp_tz)."""
    if s is None:
        return None
    parsed = _parse_ts_tz(s, session_tz or "UTC", auto=auto)
    if parsed is None:
        if soft:
            return None
        raise ValueError(f"cannot parse '{s}' as TIMESTAMP_TZ")
    aware, off_min = parsed
    sign = "+" if off_min >= 0 else "-"
    off = abs(off_min)
    return (
        aware.strftime("%Y-%m-%d %H:%M:%S.%f")
        + f" {sign}{off // 60:02d}{off % 60:02d}"
    )


def timestamp_tz_add(
    s: str | None,
    interval: str | None,
    sign: int = 1,
    session_tz: str | None = "UTC",
) -> str | None:
    """TIMESTAMP_TZ ± INTERVAL, keeping the original offset (reference
    timestamp_tz arithmetic: the instant moves, the written zone stays).
    Months add calendar-wise with end-of-month clamping, then days, then
    micros — the Postgres/reference order."""
    if s is None or interval is None:
        return None
    parsed = _parse_ts_tz(s, session_tz or "UTC")
    if parsed is None:
        raise ValueError(f"cannot parse '{s}' as TIMESTAMP_TZ")
    aware, off_min = parsed
    months, days, micros = interval_parse(interval)
    if sign < 0:
        months, days, micros = -months, -days, -micros
    if months:
        total = aware.year * 12 + (aware.month - 1) + months
        y, m0 = divmod(total, 12)
        import calendar

        day = min(aware.day, calendar.monthrange(y, m0 + 1)[1])
        aware = aware.replace(year=y, month=m0 + 1, day=day)
    aware = aware + timedelta(days=days, microseconds=micros)
    sgn = "+" if off_min >= 0 else "-"
    off = abs(off_min)
    return (
        aware.strftime("%Y-%m-%d %H:%M:%S.%f")
        + f" {sgn}{off // 60:02d}{off % 60:02d}"
    )


def timestamp_tz_micros(s: str | None, session_tz: str | None = "UTC") -> int | None:
    """Epoch micros of the instant — comparison key for ``timestamp_tz``
    operators (equal instants with different offsets compare equal)."""
    if s is None:
        return None
    parsed = _parse_ts_tz(s, session_tz or "UTC")
    if parsed is None:
        raise ValueError(f"cannot parse '{s}' as TIMESTAMP_TZ")
    aware, _ = parsed
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    delta = aware - epoch
    return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds

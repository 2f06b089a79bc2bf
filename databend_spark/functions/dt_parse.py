"""chrono-style %-format timestamp parsing (reference
``to_timestamp(text, format)``, chrono strftime specifiers via
``src/query/functions/src/scalars/timestamp``).

Key divergences from Java's DateTimeFormatter that make a custom parser
necessary (02_0012_function_datetimes_tz.test):
  * trailing INPUT after the format is exhausted is ignored;
  * numeric fields accept 1..max-width digits ('8时' parses with %H);
  * %z applies the offset and converts to the session timezone;
  * %s (epoch seconds), %G/%V/%u (ISO week date) are supported;
  * literal text (incl. non-ASCII) must match byte-for-byte.
"""

from __future__ import annotations

import datetime as _dt
import re


class DtParseError(ValueError):
    pass


def _digits(text: str, i: int, maxw: int, minw: int = 1):
    j = i
    while j < len(text) and j - i < maxw and text[j].isdigit():
        j += 1
    if j - i < minw:
        raise DtParseError(f"expected digits at {i}")
    return int(text[i:j]), j


_MONTHS = {
    m.lower(): n
    for n, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"],
        start=1,
    )
}


def parse_dt(text: str, fmt: str):
    """Returns (naive datetime, offset_minutes or None, saw_epoch)."""
    f = {
        "Y": None, "m": None, "d": None, "H": None, "M": None, "S": None,
        "f": 0, "z": None, "s": None, "G": None, "V": None, "u": None,
        "j": None, "p": None, "I": None, "y": None,
    }
    i = 0  # input pos
    k = 0  # fmt pos
    n = len(text)
    while k < len(fmt):
        c = fmt[k]
        if c != "%":
            if i >= n or text[i] != c:
                raise DtParseError(f"literal mismatch at {i}")
            i += 1
            k += 1
            continue
        k += 1
        if k >= len(fmt):
            raise DtParseError("dangling %")
        spec = fmt[k]
        k += 1
        if spec == "%":
            if i >= n or text[i] != "%":
                raise DtParseError("literal % mismatch")
            i += 1
        elif spec in ("Y", "G"):
            neg = False
            if i < n and text[i] in "+-":
                neg = text[i] == "-"
                i += 1
            # compact formats (%Y%m%d over '20240501'): the year must
            # leave digits for the following directives — fixed width 4
            # when more digit-consuming specs follow, like chrono
            cap = 4 if re.search(r"%[mdeHkMSIVuljyfC]", fmt[k:]) else 6
            v, i = _digits(text, i, cap)
            f["Y" if spec == "Y" else "G"] = -v if neg else v
        elif spec == "y":
            v, i = _digits(text, i, 2)
            f["Y"] = 2000 + v if v <= 68 else 1900 + v
        elif spec == "C":
            v, i = _digits(text, i, 2)
            f["Y"] = v * 100
        elif spec in ("m", "d", "e", "H", "k", "M", "S", "I", "V", "u", "l"):
            key = {"e": "d", "k": "H", "l": "I"}.get(spec, spec)
            v, i = _digits(text, i, 2)
            f[key] = v
        elif spec == "j":
            v, i = _digits(text, i, 3)
            f["j"] = v
        elif spec == "f":
            j = i
            while j < n and j - i < 9 and text[j].isdigit():
                j += 1
            if j == i:
                raise DtParseError("expected fraction digits")
            # left-aligned fraction: '123' = .123s -> 123000 micros
            f["f"] = int(text[i:j].ljust(9, "0")[:9]) // 1000
            i = j
        elif spec == ".":
            # %.f / %.3f etc: dot + fraction
            mm = re.match(r"(\d*)f", fmt[k:])
            if not mm:
                raise DtParseError("bad %. spec")
            k += mm.end()
            if i < n and text[i] == ".":
                i += 1
                j = i
                while j < n and text[j].isdigit():
                    j += 1
                frac = text[i:j]
                f["f"] = int(frac.ljust(6, "0")[:6]) if frac else 0
                i = j
        elif spec == "z":
            mm = re.match(r"([+-])(\d{2}):?(\d{2})?", text[i:])
            if not mm:
                raise DtParseError("bad %z")
            sign = -1 if mm.group(1) == "-" else 1
            f["z"] = sign * (int(mm.group(2)) * 60 + int(mm.group(3) or 0))
            i += mm.end()
        elif spec == "s":
            neg = False
            if i < n and text[i] == "-":
                neg = True
                i += 1
            v, i = _digits(text, i, 20)
            f["s"] = -v if neg else v
        elif spec == "p" or spec == "P":
            token = text[i: i + 2].upper()
            if token not in ("AM", "PM"):
                raise DtParseError("bad %p")
            f["p"] = token
            i += 2
        elif spec in ("a", "A"):
            mm = re.match(r"[A-Za-z]+", text[i:])
            if not mm:
                raise DtParseError("bad weekday name")
            i += mm.end()
        elif spec in ("b", "h", "B"):
            mm = re.match(r"[A-Za-z]+", text[i:])
            if not mm or mm.group(0)[:3].lower() not in _MONTHS:
                raise DtParseError("bad month name")
            f["m"] = _MONTHS[mm.group(0)[:3].lower()]
            i += mm.end()
        elif spec == "T":
            return parse_dt(text[i:], "%H:%M:%S" + fmt[k:])
        elif spec == "F":
            return parse_dt(text[i:], "%Y-%m-%d" + fmt[k:])
        elif spec == "D":
            return parse_dt(text[i:], "%m/%d/%y" + fmt[k:])
        elif spec == "R":
            return parse_dt(text[i:], "%H:%M" + fmt[k:])
        elif spec == "Z":
            mm = re.match(r"[A-Za-z_/+\-0-9]+", text[i:])
            if mm:
                i += mm.end()
        else:
            raise DtParseError(f"unsupported specifier %{spec}")
    # assemble
    if f["s"] is not None:
        if any(
            f[k] is not None for k in ("Y", "m", "d", "H", "M", "S", "G")
        ):
            raise DtParseError("%s cannot combine with date fields")
        base = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=f["s"])
        return base, 0, True  # epoch is UTC-anchored
    if f["G"] is not None or f["V"] is not None or f["u"] is not None:
        g = f["G"] if f["G"] is not None else (f["Y"] or 1970)
        v = f["V"] or 1
        u = f["u"] or 1
        base_date = _dt.date.fromisocalendar(g, v, u)
        base = _dt.datetime(
            base_date.year, base_date.month, base_date.day,
            f["H"] or 0, f["M"] or 0, f["S"] or 0, f["f"] or 0,
        )
        return base, f["z"], False
    hour = f["H"]
    if f["I"] is not None:
        hour = f["I"] % 12 + (12 if f["p"] == "PM" else 0)
    if f["Y"] is not None and f["j"] is not None and f["m"] is None:
        base = _dt.datetime(f["Y"], 1, 1) + _dt.timedelta(days=f["j"] - 1)
        base = base.replace(
            hour=hour or 0, minute=f["M"] or 0, second=f["S"] or 0,
            microsecond=f["f"] or 0,
        )
        return base, f["z"], False
    try:
        base = _dt.datetime(
            f["Y"] if f["Y"] is not None else 1970,
            f["m"] or 1,
            f["d"] or 1,
            hour or 0,
            f["M"] or 0,
            f["S"] or 0,
            f["f"] or 0,
        )
    except ValueError as exc:
        raise DtParseError(str(exc)) from exc
    return base, f["z"], False


# pre-1970 Asia/Shanghai DST windows (+9): present in the reference's
# chrono-tz tzdata but absent from this image's zoneinfo, so zone math
# for historical Chinese dates needs the explicit table
_SHANGHAI_DST = [
    ((1940, 6, 1), (1940, 10, 13)),
    ((1941, 3, 15), (1941, 11, 2)),
    ((1942, 1, 31), (1945, 9, 2)),
    ((1946, 5, 15), (1946, 10, 1)),
    ((1947, 4, 15), (1947, 11, 1)),
    ((1948, 5, 1), (1948, 10, 1)),
    ((1949, 5, 1), (1949, 5, 28)),
]


def _wall_offset(naive: _dt.datetime, tz: str, dst_fix: bool) -> _dt.timedelta:
    """Offset for a WALL time (parsing). Times in a pre-1970 Shanghai
    spring-forward gap resolve to standard (+8) unless
    enable_dst_hour_fix is on (reference timezone.rs gap handling)."""
    from zoneinfo import ZoneInfo

    if tz in ("Asia/Shanghai", "PRC") and naive.year < 1970:
        for (y0, m0, d0), (y1, m1, d1) in _SHANGHAI_DST:
            s0 = _dt.datetime(y0, m0, d0)
            e0 = _dt.datetime(y1, m1, d1)
            if s0 + _dt.timedelta(hours=1) <= naive < e0:
                return _dt.timedelta(hours=9)
            if s0 <= naive < s0 + _dt.timedelta(hours=1):  # gap hour
                return _dt.timedelta(hours=9 if dst_fix else 8)
        return _dt.timedelta(hours=8)
    loc = naive.replace(tzinfo=ZoneInfo(tz))
    return loc.utcoffset() or _dt.timedelta(0)


def _instant_offset(utc: _dt.datetime, tz: str) -> _dt.timedelta:
    """Offset for a UTC instant (rendering)."""
    from zoneinfo import ZoneInfo

    if tz in ("Asia/Shanghai", "PRC") and utc.year < 1970:
        for (y0, m0, d0), (y1, m1, d1) in _SHANGHAI_DST:
            s_utc = _dt.datetime(y0, m0, d0) - _dt.timedelta(hours=8)
            e_utc = _dt.datetime(y1, m1, d1) - _dt.timedelta(hours=9)
            if s_utc <= utc < e_utc:
                return _dt.timedelta(hours=9)
        return _dt.timedelta(hours=8)
    return (
        utc.replace(tzinfo=_dt.timezone.utc)
        .astimezone(ZoneInfo(tz))
        .utcoffset()
        or _dt.timedelta(0)
    )


def convert_tz_eval(target, ts_text, session_tz):
    """convert_timezone(target_tz, ts): interpret ts in the session
    timezone, return the wall time in the target timezone. The session
    tz may carry a '|dstfix' suffix (enable_dst_hour_fix=1)."""
    if target is None or ts_text is None:
        return None
    s = str(ts_text).strip()
    naive = _dt.datetime.strptime(
        s[:26],
        "%Y-%m-%d %H:%M:%S.%f" if "." in s else "%Y-%m-%d %H:%M:%S",
    )
    src = str(session_tz or "UTC")
    dst_fix = src.endswith("|dstfix")
    src = src.removesuffix("|dstfix")
    utc = naive - _wall_offset(naive, src, dst_fix)
    out = utc + _instant_offset(utc, str(target))
    return out.strftime("%Y-%m-%d %H:%M:%S.%f")


def dt_parse_eval(text, fmt, tz, tryf):
    """UDF body: text + chrono format -> canonical session-local
    'YYYY-MM-DD HH:MM:SS.ffffff' string (or None in try mode)."""
    if text is None or fmt is None:
        return None
    try:
        base, off_min, is_epoch = parse_dt(str(text), str(fmt))
        if off_min is not None:
            # offset-anchored: convert to the session timezone
            from zoneinfo import ZoneInfo

            utc = base - _dt.timedelta(minutes=off_min)
            loc = utc.replace(tzinfo=_dt.timezone.utc).astimezone(
                ZoneInfo(str(tz or "UTC"))
            )
            base = loc.replace(tzinfo=None)
        return base.strftime("%Y-%m-%d %H:%M:%S.%f")
    except Exception:
        if tryf:
            return None
        raise

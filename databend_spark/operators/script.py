"""SQL scripting interpreter: EXECUTE IMMEDIATE / stored procedures.

Reference: script parser+executor at ``src/query/ast/src/parser/
script.rs`` and ``src/query/script/src/`` — BEGIN/END blocks, LET
scalar and RESULTSET bindings, FOR range and row loops, WHILE, IF/
ELSEIF/ELSE, RETURN [TABLE(...)], ``:var`` substitution into SQL.

Spark-first shape: the interpreter is a thin control-flow shell — every
expression and every embedded statement evaluates through the engine's
own ``run_sql`` (so functions, casts, and table ops behave identically
to top-level SQL); only variable binding and loop control live here.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from decimal import Decimal

__all__ = ["ScriptRunner", "ScriptReturn"]

_UNSET = object()  # declared (LET x Type;) but never assigned


class ScriptReturn(Exception):
    """Control-flow: RETURN from a script. value is ('scalar', v) or
    ('table', DataFrame)."""

    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float, Decimal)):
        return str(v)
    if isinstance(v, (datetime,)):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, date):
        return f"DATE '{v.isoformat()}'"
    return "'" + str(v).replace("'", "''") + "'"


_OPENER = re.compile(r"^\s*(FOR|WHILE|IF|LOOP|BEGIN)\b", re.I)
_CLOSER = re.compile(r"^\s*END\s*(FOR|WHILE|IF|LOOP)?\s*$", re.I)


def split_statements(body: str) -> list[str]:
    """Split a script body into statements; FOR/WHILE/IF/BEGIN blocks
    stay single units (nested blocks tracked by depth)."""
    # cut on top-level ';' outside strings
    chunks, buf, i, n = [], [], 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if body[j] == "'" and body[j : j + 2] != "''":
                    break
                j += 2 if body[j : j + 2] == "''" else 1
            buf.append(body[i : j + 1])
            i = j + 1
            continue
        if ch == ";":
            chunks.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    if "".join(buf).strip():
        chunks.append("".join(buf).strip())

    # merge block chunks
    out, depth, acc = [], 0, []
    for c in chunks:
        if not c:
            continue
        opens = len(
            re.findall(
                r"(?<![\w])(?:FOR\s+\w+\s+IN\b.*?\bDO|WHILE\b.*?\bDO|"
                r"IF\b.*?\bTHEN|BEGIN)\b",
                c,
                re.I | re.S,
            )
        )
        closes = len(re.findall(r"(?<![\w])END(\s+(FOR|WHILE|IF))?\s*$", c, re.I))
        closes += len(
            re.findall(r"(?<![\w])END(\s+(FOR|WHILE|IF))?\s*;", c + ";", re.I)
        ) - 1 if False else 0
        inner_closes = len(
            re.findall(r"(?<![\w])END(\s+(FOR|WHILE|IF))?(?=\s|$)", c, re.I)
        )
        acc.append(c)
        depth += opens - inner_closes
        if depth <= 0:
            out.append(";\n".join(acc))
            acc, depth = [], 0
    if acc:
        out.append(";\n".join(acc))
    return out


class ScriptRunner:
    """Executes one script body against a ``run_sql`` callable."""

    def __init__(self, run_sql, max_steps: int = 10000):
        self.run_sql = run_sql
        self.max_steps = max_steps
        self.steps = 0
        self.vars: dict[str, object] = {}
        self.rsets: dict[str, object] = {}  # name -> DataFrame
        self.cursors: dict[str, dict] = {}

    # -- expression / sql substitution ----------------------------------

    def _substitute(self, text: str, row_vars: dict | None = None) -> str:
        """Replace :name, bare variable names, and row.field refs with
        literals."""
        rows = row_vars or {}

        # row field access  x.number
        def repl_field(m):
            base, fld = m.group(1), m.group(2)
            if base.lower() in rows:
                rec = rows[base.lower()]
                for k, v in rec.items():
                    if k.lower() == fld.lower():
                        return _sql_literal(v)
            return m.group(0)

        text = re.sub(r"\b([A-Za-z_]\w*)\.(\w+)", repl_field, text)

        def repl_colon(m):
            name = m.group(1).lower()
            if name in self.vars:
                if self.vars[name] is _UNSET:
                    raise RuntimeError(
                        f"[1128] variable {name} used before being assigned"
                    )
                return _sql_literal(self.vars[name])
            return m.group(0)

        text = re.sub(r":([A-Za-z_]\w*)", repl_colon, text)

        # bare names, longest first, masked strings
        masked, lits = _mask(text)
        for name in sorted(self.vars, key=len, reverse=True):
            if not re.search(
                rf"(?<![\w.:']){re.escape(name)}\b(?!\s*\()", masked, re.I
            ):
                continue
            if self.vars[name] is _UNSET:
                raise RuntimeError(
                    f"[1128] variable {name} used before being assigned"
                )
            masked = re.sub(
                rf"(?<![\w.:']){re.escape(name)}\b(?!\s*\()",
                _sql_literal(self.vars[name]).replace("\\", "\\\\"),
                masked,
                flags=re.I,
            )
        return _unmask(masked, lits)

    def _eval(self, expr: str, row_vars: dict | None = None):
        sub = self._substitute(expr, row_vars)
        df = self.run_sql(f"SELECT {sub}")
        row = df.first()
        return None if row is None else row[0]

    # -- execution -------------------------------------------------------

    def execute(self, body: str, args: dict | None = None):
        """Run a script; returns ('scalar', value) or ('table', df) or
        ('scalar', None)."""
        self.vars = {k.lower(): v for k, v in (args or {}).items()}
        self.rsets = {}
        body = body.strip()
        m = re.match(r"^BEGIN\b(.*)\bEND\s*;?\s*$", body, re.I | re.S)
        if m:
            body = m.group(1)
        elif re.match(r"^RETURN\b", body, re.I):
            pass
        else:
            # plain SQL (EXECUTE IMMEDIATE 'select 42')
            return ("table", self.run_sql(body))
        try:
            self._exec_block(body, {})
        except ScriptReturn as r:
            return r.value
        return ("scalar", None)

    def _exec_block(self, body: str, rows: dict):
        for stmt in split_statements(body):
            self._exec_stmt(stmt, rows)

    def _exec_stmt(self, stmt: str, rows: dict):
        s = stmt.strip()
        if not s:
            return
        self.steps += 1
        if self.steps > self.max_steps:
            raise RuntimeError(
                f"[1128] script execution exceeded the limit of "
                f"{self.max_steps} steps"
            )
        if re.match(r"^BEGIN\b", s, re.I):
            inner = re.match(r"^BEGIN\b(.*)\bEND\s*$", s, re.I | re.S)
            self._exec_block(inner.group(1) if inner else s, rows)
            return
        m = re.match(r"^RETURN\s+TABLE\s*\((.*)\)\s*$", s, re.I | re.S)
        if m:
            inner = m.group(1).strip()
            if inner.lower() in self.rsets:
                raise ScriptReturn(("table", self.rsets[inner.lower()]))
            raise ScriptReturn(
                ("table", self.run_sql(self._substitute(inner, rows)))
            )
        m = re.match(r"^RETURN\s*(.*)$", s, re.I | re.S)
        if m:
            expr = m.group(1).strip()
            if not expr:
                raise ScriptReturn(("scalar", None))
            raise ScriptReturn(("scalar", self._eval(expr, rows)))
        if re.match(r"^BREAK\s*$", s, re.I):
            raise _Break()
        if re.match(r"^CONTINUE\s*$", s, re.I):
            raise _Continue()
        m = re.match(
            r"^LET\s+([A-Za-z_]\w*)\s+CURSOR\s+FOR\s+(.*)$", s, re.I | re.S
        )
        if m:
            src = m.group(2).strip()
            if src.lower() in self.rsets:
                df = self.rsets[src.lower()]
            else:
                df = self.run_sql(self._substitute(src, rows))
            self.cursors[m.group(1).lower()] = {"df": df, "rows": None, "pos": 0}
            return
        m = re.match(r"^OPEN\s+([A-Za-z_]\w*)\s*$", s, re.I)
        if m:
            cur = self.cursors.get(m.group(1).lower())
            if cur is None:
                raise RuntimeError(f"[3128] unknown cursor {m.group(1)}")
            cur["rows"] = cur["df"].collect()
            cur["pos"] = 0
            return
        m = re.match(r"^CLOSE\s+([A-Za-z_]\w*)\s*$", s, re.I)
        if m and m.group(1).lower() in self.cursors:
            self.cursors.pop(m.group(1).lower(), None)
            return
        m = re.match(
            r"^FETCH\s+([A-Za-z_]\w*)\s+INTO\s+(.*)$", s, re.I | re.S
        )
        if m:
            cur = self.cursors.get(m.group(1).lower())
            if cur is None or cur["rows"] is None:
                raise RuntimeError(f"[3128] cursor {m.group(1)} not open")
            names = [x.strip().lower() for x in m.group(2).split(",")]
            if cur["pos"] >= len(cur["rows"]):
                raise _Break()
            rec = cur["rows"][cur["pos"]]
            cur["pos"] += 1
            for n, v in zip(names, list(rec)):
                self.vars[n] = v
            return
        m = re.match(
            r"^LET\s+([A-Za-z_]\w*)\s+RESULTSET\s*:=\s*(.*)$", s, re.I | re.S
        )
        if m:
            df = self.run_sql(self._substitute(m.group(2), rows))
            self.rsets[m.group(1).lower()] = df
            return
        m = re.match(r"^LET\s+([A-Za-z_]\w*)\s*:=\s*(.*)$", s, re.I | re.S)
        if m:
            self.vars[m.group(1).lower()] = self._eval(m.group(2), rows)
            return
        m = re.match(
            r"^LET\s+([A-Za-z_]\w*)(?:\s+\w+(?:\([^)]*\))?)?"
            r"(?:\s+DEFAULT\s+(.*))?$",
            s,
            re.I | re.S,
        )
        if m:
            # typed declaration: LET x; LET z Int; LET y Int DEFAULT z
            self.vars[m.group(1).lower()] = (
                self._eval(m.group(2), rows) if m.group(2) else _UNSET
            )
            return
        m = re.match(
            r"^FOR\s+([A-Za-z_]\w*)\s+IN\s+(.*?)\s+DO\b(.*)\bEND\s+FOR\s*$",
            s,
            re.I | re.S,
        )
        if m:
            self._exec_for(m.group(1), m.group(2), m.group(3), rows)
            return
        m = re.match(
            r"^WHILE\b(.*?)\bDO\b(.*)\bEND\s+WHILE\s*$", s, re.I | re.S
        )
        if m:
            guard = 0
            while bool(self._eval(m.group(1), rows)):
                guard += 1
                if guard > 1_000_000:
                    raise RuntimeError("[1006] script loop guard tripped")
                try:
                    self._exec_block(m.group(2), rows)
                except _Break:
                    break
                except _Continue:
                    continue
            return
        m = re.match(r"^IF\b(.*)\bEND\s+IF\s*$", s, re.I | re.S)
        if m:
            self._exec_if(m.group(1), rows)
            return
        m = re.match(r"^([A-Za-z_]\w*)\s*:=\s*(.*)$", s, re.S)
        if m and m.group(1).upper() not in ("SET",):
            self.vars[m.group(1).lower()] = self._eval(m.group(2), rows)
            return
        # plain SQL statement; SELECTs materialize so runtime errors
        # (e.g. division by zero) surface like the reference's executor
        df = self.run_sql(self._substitute(s, rows))
        if re.match(r"^(SELECT|WITH)\b", s, re.I) and hasattr(df, "first"):
            df.first()

    def _exec_for(self, var, source, body, rows):
        var_l = var.lower()
        mrange = re.match(r"^(.*?)\s+TO\s+(.*)$", source, re.I | re.S)
        if mrange and not re.match(r"^\s*SELECT\b", source, re.I):
            lo = self._eval(mrange.group(1), rows)
            hi = self._eval(mrange.group(2), rows)
            if lo > hi:
                raise RuntimeError(
                    "[1006] start must be less than or equal to end "
                    "when step is positive"
                )
            saved = self.vars.get(var_l)
            for v in range(int(lo), int(hi) + 1):
                self.vars[var_l] = v
                try:
                    self._exec_block(body, rows)
                except _Break:
                    break
                except _Continue:
                    continue
            if saved is not None:
                self.vars[var_l] = saved
            return
        # row loop: cursor name, resultset name, or inline SELECT
        src = source.strip()
        if src.lower() in self.cursors:
            df = self.cursors[src.lower()]["df"]
        elif src.lower() in self.rsets:
            df = self.rsets[src.lower()]
        else:
            df = self.run_sql(self._substitute(src, rows))
        for rec in df.collect():
            rows2 = dict(rows)
            rows2[var_l] = rec.asDict()
            try:
                self._exec_block(body, rows2)
            except _Break:
                break
            except _Continue:
                continue

    def _exec_if(self, content, rows):
        # content: cond THEN body [ELSEIF cond THEN body]* [ELSE body]
        parts = re.split(r"\bELSEIF\b", content, flags=re.I)
        tail_else = None
        branches = []
        for i, part in enumerate(parts):
            me = re.split(r"\bELSE\b(?!IF)", part, maxsplit=1, flags=re.I)
            cond_body = me[0]
            if len(me) > 1:
                tail_else = me[1]
            mct = re.match(r"^(.*?)\bTHEN\b(.*)$", cond_body, re.I | re.S)
            if mct:
                branches.append((mct.group(1), mct.group(2)))
        for cond, body in branches:
            if bool(self._eval(cond, rows)):
                self._exec_block(body, rows)
                return
        if tail_else is not None:
            self._exec_block(tail_else, rows)


def _mask(text: str):
    lits = []

    def rec(m):
        lits.append(m.group(0))
        return f"\x00L{len(lits) - 1}\x00"

    return re.sub(r"'(?:[^']|'')*'", rec, text), lits


def _unmask(text: str, lits):
    for i, l in enumerate(lits):
        text = text.replace(f"\x00L{i}\x00", l)
    return text

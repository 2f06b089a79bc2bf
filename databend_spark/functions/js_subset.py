"""Interpreter for the JavaScript subset used by ``LANGUAGE javascript``
UDFs/UDAFs in the reference's test corpus (reference embeds a full JS
engine via arrow-udf-js — src/query/expression/src/utils/udf_client.rs
wires it; tests/sqllogictests/suites/base/03_common/03_0013_select_udf.test,
03_0047_select_udaf.test, query/having.test, udf_native/03_0001_udf_js.test).

We interpret rather than embed: the corpus uses a small imperative subset —
function declarations, let/const/var, if/else, while, for(;;), switch,
return/break/continue, assignment operators, ternary, logical/equality/
relational/arithmetic operators, member + index access, object/array
literals, string methods (substring/includes/length/…), parseInt/parseFloat,
Math, minimal Date, and BigDecimal (arrow-udf's decimal bridge).

Values map JS→Python: null/undefined→None, numbers→int/float, strings→str,
arrays→list, objects→dict, Date→_JSDate, BigDecimal→decimal.Decimal.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from decimal import Decimal, localcontext

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*"|`(?:[^`\\]|\\.)*`)
  | (?P<name>[A-Za-z_$][\w$]*)
  | (?P<punct>===|!==|==|!=|<=|>=|&&|\|\||\+\+|--|\+=|-=|\*=|/=|%=|=>|[-+*/%!<>=(){}\[\],.;:?])
    """,
    re.X | re.S,
)

_KEYWORDS = {
    "function", "return", "if", "else", "while", "for", "let", "const",
    "var", "true", "false", "null", "undefined", "new", "break",
    "continue", "switch", "case", "default", "export", "typeof",
}


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SyntaxError(f"js: bad char {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        kind, text = m.lastgroup, m.group()
        if kind == "name" and text in _KEYWORDS:
            kind = text
        toks.append((kind, text))
    toks.append(("eof", ""))
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, text: str):
        t = self.next()
        if t[1] != text and t[0] != text:
            raise SyntaxError(f"js: expected {text!r}, got {t[1]!r}")
        return t

    def at(self, text: str) -> bool:
        t = self.peek()
        return t[1] == text or t[0] == text

    # ---- module = sequence of (exported) function decls ----
    def parse_module(self) -> dict[str, tuple[list[str], list]]:
        fns: dict[str, tuple[list[str], list]] = {}
        while not self.at("eof"):
            if self.at("export"):
                self.next()
            if self.at("function"):
                name, params, body = self.parse_function()
                fns[name] = (params, body)
            elif self.at(";"):
                self.next()
            else:
                raise SyntaxError(
                    f"js: expected function decl, got {self.peek()[1]!r}"
                )
        return fns

    def parse_function(self):
        self.eat("function")
        name = self.next()[1]
        self.eat("(")
        params = []
        while not self.at(")"):
            params.append(self.next()[1])
            if self.at(","):
                self.next()
        self.eat(")")
        body = self.parse_block()
        return name, params, body

    def parse_block(self) -> list:
        self.eat("{")
        stmts = []
        while not self.at("}"):
            stmts.append(self.parse_stmt())
        self.eat("}")
        return stmts

    def parse_stmt(self):
        t = self.peek()
        if t[1] == "{":
            return ("block", self.parse_block())
        if t[0] in ("let", "const", "var"):
            self.next()
            decls = []
            while True:
                name = self.next()[1]
                init = None
                if self.at("="):
                    self.next()
                    init = self.parse_expr()
                decls.append((name, init))
                if self.at(","):
                    self.next()
                    continue
                break
            self._semi()
            return ("decl", decls)
        if t[0] == "return":
            self.next()
            val = None
            if not self.at(";") and not self.at("}"):
                val = self.parse_expr()
            self._semi()
            return ("return", val)
        if t[0] == "if":
            self.next()
            self.eat("(")
            cond = self.parse_expr()
            self.eat(")")
            then = self.parse_stmt()
            other = None
            if self.at("else"):
                self.next()
                other = self.parse_stmt()
            return ("if", cond, then, other)
        if t[0] == "while":
            self.next()
            self.eat("(")
            cond = self.parse_expr()
            self.eat(")")
            return ("while", cond, self.parse_stmt())
        if t[0] == "for":
            self.next()
            self.eat("(")
            init = None
            if not self.at(";"):
                init = self.parse_stmt()  # consumes its own ';'
            else:
                self.next()
            cond = None if self.at(";") else self.parse_expr()
            self.eat(";")
            step = None if self.at(")") else self.parse_expr()
            self.eat(")")
            return ("for", init, cond, step, self.parse_stmt())
        if t[0] == "switch":
            self.next()
            self.eat("(")
            subj = self.parse_expr()
            self.eat(")")
            self.eat("{")
            cases, default = [], None
            while not self.at("}"):
                if self.at("case"):
                    self.next()
                    val = self.parse_expr()
                    self.eat(":")
                    body = []
                    while not self.at("case") and not self.at("default") \
                            and not self.at("}"):
                        body.append(self.parse_stmt())
                    cases.append((val, body))
                else:
                    self.eat("default")
                    self.eat(":")
                    default = []
                    while not self.at("case") and not self.at("}"):
                        default.append(self.parse_stmt())
            self.eat("}")
            return ("switch", subj, cases, default)
        if t[0] == "break":
            self.next()
            self._semi()
            return ("break",)
        if t[0] == "continue":
            self.next()
            self._semi()
            return ("continue",)
        expr = self.parse_expr()
        self._semi()
        return ("expr", expr)

    def _semi(self):
        if self.at(";"):
            self.next()

    # ---- expressions (precedence climbing) ----
    def parse_expr(self):
        return self.parse_assign()

    def parse_assign(self):
        left = self.parse_ternary()
        if self.peek()[1] in ("=", "+=", "-=", "*=", "/=", "%="):
            op = self.next()[1]
            right = self.parse_assign()
            return ("assign", op, left, right)
        return left

    def parse_ternary(self):
        cond = self.parse_or()
        if self.at("?"):
            self.next()
            a = self.parse_assign()
            self.eat(":")
            b = self.parse_assign()
            return ("ternary", cond, a, b)
        return cond

    def _binop(self, sub, ops):
        left = sub()
        while self.peek()[1] in ops:
            op = self.next()[1]
            left = ("bin", op, left, sub())
        return left

    def parse_or(self):
        return self._binop(self.parse_and, ("||",))

    def parse_and(self):
        return self._binop(self.parse_eq, ("&&",))

    def parse_eq(self):
        return self._binop(self.parse_rel, ("==", "!=", "===", "!=="))

    def parse_rel(self):
        return self._binop(self.parse_add, ("<", ">", "<=", ">="))

    def parse_add(self):
        return self._binop(self.parse_mul, ("+", "-"))

    def parse_mul(self):
        return self._binop(self.parse_unary, ("*", "/", "%"))

    def parse_unary(self):
        t = self.peek()
        if t[1] in ("!", "-", "+"):
            self.next()
            return ("unary", t[1], self.parse_unary())
        if t[0] == "typeof":
            self.next()
            return ("typeof", self.parse_unary())
        if t[0] == "new":
            self.next()
            name = self.next()[1]
            args = []
            if self.at("("):
                args = self._arglist()
            return ("new", name, args)
        return self.parse_postfix()

    def _arglist(self):
        self.eat("(")
        args = []
        while not self.at(")"):
            args.append(self.parse_assign())
            if self.at(","):
                self.next()
        self.eat(")")
        return args

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            t = self.peek()
            if t[1] == ".":
                self.next()
                e = ("member", e, self.next()[1])
            elif t[1] == "[":
                self.next()
                idx = self.parse_expr()
                self.eat("]")
                e = ("index", e, idx)
            elif t[1] == "(":
                e = ("call", e, self._arglist())
            elif t[1] in ("++", "--"):
                self.next()
                e = ("postincr", t[1], e)
            else:
                return e

    def parse_primary(self):
        t = self.next()
        if t[0] == "num":
            txt = t[1]
            return ("lit", float(txt) if ("." in txt or "e" in txt.lower())
                    else int(txt))
        if t[0] == "str":
            body = t[1][1:-1]
            return ("lit", re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(
                    m.group(1), m.group(1)
                ),
                body,
            ))
        if t[0] == "true":
            return ("lit", True)
        if t[0] == "false":
            return ("lit", False)
        if t[0] in ("null", "undefined"):
            return ("lit", None)
        if t[1] == "(":
            e = self.parse_expr()
            self.eat(")")
            return e
        if t[1] == "[":
            items = []
            while not self.at("]"):
                items.append(self.parse_assign())
                if self.at(","):
                    self.next()
            self.eat("]")
            return ("array", items)
        if t[1] == "{":
            pairs = []
            while not self.at("}"):
                k = self.next()
                key = k[1][1:-1] if k[0] == "str" else k[1]
                self.eat(":")
                pairs.append((key, self.parse_assign()))
                if self.at(","):
                    self.next()
            self.eat("}")
            return ("object", pairs)
        if t[0] == "name":
            return ("name", t[1])
        raise SyntaxError(f"js: unexpected token {t[1]!r}")


class _JSDate:
    """Minimal JS Date over a Python datetime (UTC-naive)."""

    def __init__(self, dt: _dt.datetime | None):
        self.dt = dt  # None = Invalid Date

    @classmethod
    def parse(cls, s: str) -> "_JSDate":
        for fmt in ("%Y%m%d", "%Y-%m-%d", "%Y-%m-%dT%H:%M:%S",
                    "%Y-%m-%d %H:%M:%S"):
            try:
                return cls(_dt.datetime.strptime(s, fmt))
            except ValueError:
                continue
        return cls(None)

    def _ts(self) -> float:
        return float("nan") if self.dt is None else self.dt.timestamp()


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


def _truthy(v) -> bool:
    if v is None or v is False:
        return False
    if isinstance(v, float) and math.isnan(v):
        return False
    if isinstance(v, (int, float, Decimal)):
        return v != 0
    if isinstance(v, str):
        return v != ""
    return True


def _js_num(v):
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float, Decimal)):
        return v
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return float("nan")
    if v is None:
        return 0
    return float("nan")


def _loose_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return _js_num(a) == _js_num(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, (int, float, Decimal)) or isinstance(
        b, (int, float, Decimal)
    ):
        na, nb = _js_num(a), _js_num(b)
        try:
            return na == nb
        except TypeError:
            return False
    return a is b or a == b


class Interpreter:
    def __init__(self, src: str):
        self.functions = _Parser(_tokenize(src)).parse_module()

    def call(self, name: str, args: list):
        if name not in self.functions:
            raise NameError(f"js: no function {name!r}")
        params, body = self.functions[name]
        env = dict(zip(params, args))
        # BigDecimal math must not round at Python's default 28 digits
        # (decimal256 carries up to 76)
        with localcontext() as ctx:
            ctx.prec = 96
            try:
                for st in body:
                    self._exec(st, env)
            except _Return as r:
                return r.value
        return None

    # ---- statements ----
    def _exec(self, st, env):
        kind = st[0]
        if kind == "block":
            for s in st[1]:
                self._exec(s, env)
        elif kind == "decl":
            for name, init in st[1]:
                env[name] = self._eval(init, env) if init is not None else None
        elif kind == "expr":
            self._eval(st[1], env)
        elif kind == "return":
            raise _Return(
                self._eval(st[1], env) if st[1] is not None else None
            )
        elif kind == "if":
            if _truthy(self._eval(st[1], env)):
                self._exec(st[2], env)
            elif st[3] is not None:
                self._exec(st[3], env)
        elif kind == "while":
            while _truthy(self._eval(st[1], env)):
                try:
                    self._exec(st[2], env)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "for":
            _init, cond, step, body = st[1], st[2], st[3], st[4]
            if _init is not None:
                self._exec(_init, env)
            while cond is None or _truthy(self._eval(cond, env)):
                try:
                    self._exec(body, env)
                except _Break:
                    break
                except _Continue:
                    pass
                if step is not None:
                    self._eval(step, env)
        elif kind == "switch":
            subj = self._eval(st[1], env)
            matched = False
            try:
                for val, body in st[2]:
                    if matched or self._eval(val, env) == subj:
                        matched = True
                        for s in body:
                            self._exec(s, env)
                if not matched and st[3] is not None:
                    for s in st[3]:
                        self._exec(s, env)
            except _Break:
                pass
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        else:
            raise RuntimeError(f"js: unknown stmt {kind}")

    # ---- expressions ----
    def _eval(self, e, env):
        kind = e[0]
        if kind == "lit":
            return e[1]
        if kind == "name":
            if e[1] in env:
                return env[e[1]]
            if e[1] in ("NaN",):
                return float("nan")
            if e[1] in ("Infinity",):
                return float("inf")
            raise NameError(f"js: undefined variable {e[1]!r}")
        if kind == "array":
            return [self._eval(x, env) for x in e[1]]
        if kind == "object":
            return {k: self._eval(v, env) for k, v in e[1]}
        if kind == "ternary":
            return (
                self._eval(e[2], env)
                if _truthy(self._eval(e[1], env))
                else self._eval(e[3], env)
            )
        if kind == "unary":
            op, v = e[1], self._eval(e[2], env)
            if op == "!":
                return not _truthy(v)
            if op == "-":
                return -_js_num(v)
            return +_js_num(v)
        if kind == "typeof":
            v = self._eval(e[1], env)
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float, Decimal)):
                return "number"
            if isinstance(v, str):
                return "string"
            return "object"
        if kind == "bin":
            return self._binop(e[1], e[2], e[3], env)
        if kind == "assign":
            return self._assign(e[1], e[2], e[3], env)
        if kind == "postincr":
            cur = self._eval(e[2], env)
            self._store(e[2], _js_num(cur) + (1 if e[1] == "++" else -1), env)
            return cur
        if kind == "member":
            return self._member(self._eval(e[1], env), e[2], env)
        if kind == "index":
            obj = self._eval(e[1], env)
            idx = self._eval(e[2], env)
            if isinstance(obj, dict):
                return obj.get(idx)
            if isinstance(obj, str):
                i = int(idx)
                return obj[i] if 0 <= i < len(obj) else None
            if isinstance(obj, list):
                i = int(idx)
                return obj[i] if 0 <= i < len(obj) else None
            raise TypeError("js: not indexable")
        if kind == "call":
            return self._call(e[1], e[2], env)
        if kind == "new":
            name, args = e[1], [self._eval(a, env) for a in e[2]]
            if name == "Date":
                if not args:
                    return _JSDate(_dt.datetime.now())
                a = args[0]
                if isinstance(a, _JSDate):
                    return _JSDate(a.dt)
                if isinstance(a, (int, float)):
                    return _JSDate(_dt.datetime.fromtimestamp(a / 1000.0))
                return _JSDate.parse(str(a))
            raise NameError(f"js: unknown constructor {name}")
        raise RuntimeError(f"js: unknown expr {kind}")

    def _binop(self, op, le, re_, env):
        if op == "&&":
            lv = self._eval(le, env)
            return self._eval(re_, env) if _truthy(lv) else lv
        if op == "||":
            lv = self._eval(le, env)
            return lv if _truthy(lv) else self._eval(re_, env)
        a, b = self._eval(le, env), self._eval(re_, env)
        if op == "==":
            return _loose_eq(a, b)
        if op == "!=":
            return not _loose_eq(a, b)
        if op == "===":
            return self._strict_eq(a, b)
        if op == "!==":
            return not self._strict_eq(a, b)
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return self._to_str(a) + self._to_str(b)
            if isinstance(a, Decimal) or isinstance(b, Decimal):
                return Decimal(str(a)) + Decimal(str(b))
            return _js_num(a) + _js_num(b)
        if isinstance(a, _JSDate) or isinstance(b, _JSDate):
            a = a._ts() if isinstance(a, _JSDate) else _js_num(a)
            b = b._ts() if isinstance(b, _JSDate) else _js_num(b)
        else:
            if op in ("<", ">", "<=", ">=") and isinstance(a, str) \
                    and isinstance(b, str):
                return {"<": a < b, ">": a > b,
                        "<=": a <= b, ">=": a >= b}[op]
            if isinstance(a, Decimal) or isinstance(b, Decimal):
                a, b = Decimal(str(a)), Decimal(str(b))
            else:
                a, b = _js_num(a), _js_num(b)
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if isinstance(a, Decimal):
                return a / b
            return a / b if b != 0 else (
                float("nan") if a == 0 else math.copysign(float("inf"), a)
            )
        if op == "%":
            if b == 0:
                return float("nan")
            r = math.fmod(a, b)  # JS remainder keeps the dividend's sign
            if isinstance(a, int) and isinstance(b, int):
                r = int(r)
            return r
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]

    @staticmethod
    def _strict_eq(a, b) -> bool:
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        if isinstance(a, (int, float, Decimal)) and isinstance(
            b, (int, float, Decimal)
        ):
            return a == b
        if type(a) is not type(b):
            return False
        return a == b

    @staticmethod
    def _to_str(v) -> str:
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return str(v)

    def _assign(self, op, target, rhs_e, env):
        rhs = self._eval(rhs_e, env)
        if op != "=":
            cur = self._eval(target, env)
            sym = op[0]
            rhs = self._binop(sym, ("lit", cur), ("lit", rhs), env)
        self._store(target, rhs, env)
        return rhs

    def _store(self, target, value, env):
        if target[0] == "name":
            env[target[1]] = value
        elif target[0] == "member":
            obj = self._eval(target[1], env)
            if isinstance(obj, dict):
                obj[target[2]] = value
            else:
                raise TypeError("js: cannot set member")
        elif target[0] == "index":
            obj = self._eval(target[1], env)
            idx = self._eval(target[2], env)
            if isinstance(obj, dict):
                obj[idx] = value
            elif isinstance(obj, list):
                obj[int(idx)] = value
            else:
                raise TypeError("js: cannot set index")
        else:
            raise TypeError("js: invalid assignment target")

    def _member(self, obj, name, env):
        if isinstance(obj, dict):
            return obj.get(name)
        if isinstance(obj, str):
            if name == "length":
                return len(obj)
            return ("strmeth", obj, name)
        if isinstance(obj, list):
            if name == "length":
                return len(obj)
            return ("listmeth", obj, name)
        if isinstance(obj, _JSDate):
            return ("datemeth", obj, name)
        if obj is None:
            raise TypeError(f"js: cannot read {name!r} of null")
        return None

    def _call(self, fn_e, arg_es, env):
        args = [self._eval(a, env) for a in arg_es]
        # builtin free functions
        if fn_e[0] == "name":
            name = fn_e[1]
            if name == "parseInt":
                s = str(args[0]).strip()
                m = re.match(r"[+-]?\d+", s)
                return int(m.group()) if m else float("nan")
            if name == "parseFloat":
                s = str(args[0]).strip()
                m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
                return float(m.group()) if m else float("nan")
            if name == "isNaN":
                n = _js_num(args[0])
                return isinstance(n, float) and math.isnan(n)
            if name == "String":
                return self._to_str(args[0]) if args else ""
            if name == "Number":
                return _js_num(args[0]) if args else 0
            if name == "Boolean":
                return _truthy(args[0]) if args else False
            if name == "BigDecimal":
                return Decimal(str(args[0]))
            if name in self.functions:
                return self.call(name, args)
            raise NameError(f"js: unknown function {name!r}")
        if fn_e[0] == "member":
            recv = self._eval(fn_e[1], env)
            meth = fn_e[2]
            # Math.*
            if fn_e[1] == ("name", "Math") or (
                fn_e[1][0] == "name" and fn_e[1][1] == "Math"
            ):
                f = {
                    "floor": math.floor, "ceil": math.ceil,
                    "abs": abs, "sqrt": math.sqrt,
                    "round": lambda x: math.floor(x + 0.5),
                    "max": max, "min": min, "pow": pow,
                    "trunc": math.trunc,
                }[meth]
                return f(*[_js_num(a) for a in args])
            return self._dispatch_method(recv, meth, args)
        raise TypeError("js: not callable")

    def _dispatch_method(self, recv, meth, args):
        if isinstance(recv, str):
            if meth == "substring":
                a = max(0, int(args[0]))
                b = max(0, int(args[1])) if len(args) > 1 else len(recv)
                if a > b:
                    a, b = b, a
                return recv[a:b]
            if meth in ("slice", "substr"):
                a = int(args[0])
                if meth == "substr":
                    ln = int(args[1]) if len(args) > 1 else len(recv)
                    a = a if a >= 0 else max(0, len(recv) + a)
                    return recv[a : a + ln]
                b = int(args[1]) if len(args) > 1 else len(recv)
                return recv[a:b]
            if meth == "charAt":
                i = int(args[0])
                return recv[i] if 0 <= i < len(recv) else ""
            if meth == "charCodeAt":
                i = int(args[0])
                return ord(recv[i]) if 0 <= i < len(recv) else float("nan")
            if meth == "indexOf":
                return recv.find(str(args[0]))
            if meth == "includes":
                return str(args[0]) in recv
            if meth == "startsWith":
                return recv.startswith(str(args[0]))
            if meth == "endsWith":
                return recv.endswith(str(args[0]))
            if meth == "toUpperCase":
                return recv.upper()
            if meth == "toLowerCase":
                return recv.lower()
            if meth == "trim":
                return recv.strip()
            if meth == "split":
                return recv.split(str(args[0])) if args else [recv]
            if meth == "repeat":
                return recv * int(args[0])
            if meth == "replace":
                return recv.replace(str(args[0]), str(args[1]), 1)
            if meth == "replaceAll":
                return recv.replace(str(args[0]), str(args[1]))
            if meth == "padStart":
                return recv.rjust(int(args[0]), str(args[1]) if len(args) > 1 else " ")
            if meth == "toString":
                return recv
        if isinstance(recv, list):
            if meth == "includes":
                return any(self._strict_eq(x, args[0]) for x in recv)
            if meth == "push":
                recv.extend(args)
                return len(recv)
            if meth == "pop":
                return recv.pop() if recv else None
            if meth == "indexOf":
                for i, x in enumerate(recv):
                    if self._strict_eq(x, args[0]):
                        return i
                return -1
            if meth == "join":
                sep = str(args[0]) if args else ","
                return sep.join(self._to_str(x) for x in recv)
            if meth == "slice":
                a = int(args[0]) if args else 0
                b = int(args[1]) if len(args) > 1 else len(recv)
                return recv[a:b]
            if meth == "concat":
                out = list(recv)
                for a in args:
                    out.extend(a if isinstance(a, list) else [a])
                return out
            if meth == "reverse":
                recv.reverse()
                return recv
        if isinstance(recv, _JSDate):
            d = recv.dt
            if meth == "getFullYear":
                return d.year if d else float("nan")
            if meth == "getMonth":
                return d.month - 1 if d else float("nan")
            if meth == "getDate":
                return d.day if d else float("nan")
            if meth == "getHours":
                return d.hour if d else float("nan")
            if meth == "getMinutes":
                return d.minute if d else float("nan")
            if meth == "getSeconds":
                return d.second if d else float("nan")
            if meth == "getTime":
                return recv._ts() * 1000 if d else float("nan")
            if meth == "setDate":
                if d is not None:
                    day = int(_js_num(args[0]))
                    first = d.replace(day=1)
                    recv.dt = first + _dt.timedelta(days=day - 1)
                return recv._ts() * 1000
            if meth == "setMonth":
                if d is not None:
                    mo = int(_js_num(args[0]))
                    y, m = d.year + mo // 12, mo % 12 + 1
                    recv.dt = d.replace(year=y, month=m)
                return recv._ts() * 1000
            if meth == "setFullYear":
                if d is not None:
                    recv.dt = d.replace(year=int(_js_num(args[0])))
                return recv._ts() * 1000
            if meth == "toISOString":
                return d.strftime("%Y-%m-%dT%H:%M:%S.000Z") if d else None
        if isinstance(recv, dict):
            fn = recv.get(meth)
            raise TypeError(f"js: {meth!r} is not a method")
        raise TypeError(f"js: no method {meth!r} on {type(recv).__name__}")

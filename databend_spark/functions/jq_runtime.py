"""A self-contained jq-filter engine backing the ``jq`` set-returning
function (reference srfs/variant.rs:439-562, which embeds the jaq
crate). Implements the practical jq subset: paths (``.a.b[0][]``),
pipes, comma, arithmetic/comparison/boolean operators, ``select``,
object/array construction, ``if/elif/else/end``, and the common
builtins (length, add, min, max, keys, values, to_entries,
from_entries, tostring, tonumber, type, ascii_upcase/downcase, map,
has, reverse, sort, sort_by, join, split, range, first, last, not,
empty, floor, ceil, sqrt, abs, any, all, unique).

Filters are parsed once per (partition × filter) and evaluated
row-at-a-time as generators, matching jq's stream semantics (a filter
maps one input to zero-or-more outputs).
"""

from __future__ import annotations

import json
import math
import re
from functools import lru_cache

__all__ = ["jq_compile", "jq_run", "JqError"]


class JqError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<op>\.\.|==|!=|<=|>=|\|\||and\b|or\b|[.|,:;()\[\]{}<>+\-*/%?=])
  | (?P<name>\$?[A-Za-z_]\w*)
    """,
    re.X,
)

_KEYWORDS = {"if", "then", "elif", "else", "end", "and", "or", "reduce", "as", "def"}


def _lex(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise JqError(f"jq: bad character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group(0)
        if kind == "name" and text in _KEYWORDS:
            toks.append(("kw", text))
        else:
            toks.append((kind, text))
    toks.append(("eof", ""))
    return toks


# --------------------------------------------------------------- parser
# Precedence (low→high): pipe | , comma , or, and, comparison,
# additive, multiplicative, unary, postfix, primary.


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        k, t = self.next()
        if t != text:
            raise JqError(f"jq: expected {text!r}, got {t!r}")

    def at(self, text: str) -> bool:
        return self.peek()[1] == text

    def eat(self, text: str) -> bool:
        if self.at(text):
            self.next()
            return True
        return False

    # entry
    def parse(self):
        node = self.pipe()
        if self.peek()[0] != "eof":
            raise JqError(f"jq: trailing input at {self.peek()[1]!r}")
        return node

    def pipe(self):
        node = self.comma()
        while self.eat("|"):
            node = ("pipe", node, self.comma())
        return node

    def comma(self):
        node = self.or_()
        while self.eat(","):
            node = ("comma", node, self.or_())
        return node

    def or_(self):
        node = self.and_()
        while self.peek() == ("kw", "or"):
            self.next()
            node = ("or", node, self.and_())
        return node

    def and_(self):
        node = self.cmp()
        while self.peek() == ("kw", "and"):
            self.next()
            node = ("and", node, self.cmp())
        return node

    def cmp(self):
        node = self.add()
        while self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = ("cmp", op, node, self.add())
        return node

    def add(self):
        node = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.mul())
        return node

    def mul(self):
        node = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.eat("-"):
            return ("neg", self.postfix())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            k, t = self.peek()
            if t == ".":
                # .foo after an expression (e.g. `(expr).name`)
                self.next()
                k2, t2 = self.peek()
                if k2 in ("name", "str"):
                    self.next()
                    name = json.loads(t2) if k2 == "str" else t2
                    node = ("field", node, name, self.eat("?"))
                else:
                    raise JqError("jq: expected field name after '.'")
            elif t == "[":
                self.next()
                if self.eat("]"):
                    node = ("iterate", node, self.eat("?"))
                else:
                    idx = self.pipe()
                    if self.eat(":"):
                        hi = None if self.at("]") else self.pipe()
                        self.expect("]")
                        node = ("slice", node, idx, hi)
                    else:
                        self.expect("]")
                        node = ("index", node, idx, self.eat("?"))
            else:
                return node

    def primary(self):
        k, t = self.peek()
        if t == ".":
            self.next()
            k2, t2 = self.peek()
            if k2 in ("name", "str"):
                self.next()
                name = json.loads(t2) if k2 == "str" else t2
                return ("field", ("id",), name, self.eat("?"))
            return ("id",)
        if k == "num":
            self.next()
            v = float(t)
            return ("lit", int(v) if v.is_integer() and "." not in t and "e" not in t.lower() else v)
        if k == "str":
            self.next()
            return ("lit", json.loads(t))
        if t == "(":
            self.next()
            node = self.pipe()
            self.expect(")")
            return node
        if t == "[":
            self.next()
            if self.eat("]"):
                return ("array", None)
            node = self.pipe()
            self.expect("]")
            return ("array", node)
        if t == "{":
            self.next()
            fields = []
            if not self.at("}"):
                while True:
                    fields.append(self._objfield())
                    if not self.eat(","):
                        break
            self.expect("}")
            return ("object", fields)
        if k == "kw" and t == "if":
            self.next()
            branches = []
            cond = self.pipe()
            self.expect("then")
            branches.append((cond, self.pipe()))
            while self.peek() == ("kw", "elif"):
                self.next()
                c = self.pipe()
                self.expect("then")
                branches.append((c, self.pipe()))
            els = ("id",)
            if self.peek() == ("kw", "else"):
                self.next()
                els = self.pipe()
            if self.peek() != ("kw", "end"):
                raise JqError("jq: expected 'end'")
            self.next()
            return ("if", branches, els)
        if k == "name":
            self.next()
            if t in ("true", "false", "null"):
                return ("lit", {"true": True, "false": False, "null": None}[t])
            if self.at("("):
                self.next()
                args = [self.pipe()]
                while self.eat(";"):
                    args.append(self.pipe())
                self.expect(")")
                return ("call", t, args)
            return ("call", t, [])
        raise JqError(f"jq: unexpected token {t!r}")

    def _objfield(self):
        k, t = self.peek()
        if k == "name" or k == "kw":
            self.next()
            key = ("lit", t)
        elif k == "str":
            self.next()
            key = ("lit", json.loads(t))
        elif t == "(":
            self.next()
            key = self.pipe()
            self.expect(")")
        else:
            raise JqError(f"jq: bad object key {t!r}")
        if self.eat(":"):
            # value can't contain a top-level comma (field separator)
            val = self.or_()
        else:
            if key[0] != "lit":
                raise JqError("jq: shorthand key must be a name")
            val = ("field", ("id",), key[1], False)
        return (key, val)


# ------------------------------------------------------------ evaluator


def _truthy(v) -> bool:
    return v is not None and v is not False


def _type(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


_TYPE_ORD = {"null": 0, "boolean": 1, "number": 2, "string": 3, "array": 4, "object": 5}


def _cmp_key(v):
    t = _TYPE_ORD[_type(v)]
    if isinstance(v, dict):
        return (t, sorted(v.items(), key=lambda kv: kv[0]))
    if isinstance(v, bool):
        return (t, v)
    return (t, v)


def _canon(v) -> str:
    return json.dumps(v, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def _num(v):
    # normalize float results that are integral back to int (jq prints 1, not 1.0)
    if isinstance(v, float) and not isinstance(v, bool) and v.is_integer() and abs(v) < 1e15:
        return int(v)
    return v


def _arith(op, a, b):
    if op == "+":
        if a is None:
            return b
        if b is None:
            return a
        if isinstance(a, bool) or isinstance(b, bool):
            raise JqError("jq: cannot add booleans")
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return _num(a + b)
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            out.update(b)
            return out
        raise JqError(f"jq: {_type(a)} and {_type(b)} cannot be added")
    if not (isinstance(a, (int, float)) and isinstance(b, (int, float))) or isinstance(
        a, bool
    ) or isinstance(b, bool):
        raise JqError(f"jq: {_type(a)} and {_type(b)}: invalid arithmetic")
    if op == "-":
        return _num(a - b)
    if op == "*":
        return _num(a * b)
    if op == "/":
        if b == 0:
            raise JqError("jq: division by zero")
        return _num(a / b)
    if op == "%":
        if b == 0:
            raise JqError("jq: division by zero")
        return _num(int(a) - int(b) * (int(a) // int(b)) if (a >= 0) == (b >= 0) else int(math.fmod(int(a), int(b))))
    raise JqError(f"jq: bad op {op}")


def _eval(node, v):
    kind = node[0]
    if kind == "id":
        yield v
    elif kind == "lit":
        yield node[1]
    elif kind == "pipe":
        for a in _eval(node[1], v):
            yield from _eval(node[2], a)
    elif kind == "comma":
        yield from _eval(node[1], v)
        yield from _eval(node[2], v)
    elif kind == "field":
        _, src, name, opt = node
        for s in _eval(src, v):
            if s is None:
                yield None
            elif isinstance(s, dict):
                yield s.get(name)
            elif opt:
                continue
            else:
                raise JqError(f"jq: cannot index {_type(s)} with \"{name}\"")
    elif kind == "iterate":
        _, src, opt = node
        for s in _eval(src, v):
            if isinstance(s, list):
                yield from s
            elif isinstance(s, dict):
                for k in sorted(s):
                    yield s[k]
            elif opt:
                continue
            else:
                raise JqError(f"jq: cannot iterate over {_type(s)}")
    elif kind == "index":
        _, src, idx, opt = node
        for s in _eval(src, v):
            for i in _eval(idx, v):
                if isinstance(s, list) and isinstance(i, int) and not isinstance(i, bool):
                    n = len(s)
                    j = i + n if i < 0 else i
                    yield s[j] if 0 <= j < n else None
                elif isinstance(s, dict) and isinstance(i, str):
                    yield s.get(i)
                elif s is None:
                    yield None
                elif opt:
                    continue
                else:
                    raise JqError(f"jq: cannot index {_type(s)} with {_type(i)}")
    elif kind == "slice":
        _, src, lo, hi = node
        for s in _eval(src, v):
            if not isinstance(s, (list, str)) and s is not None:
                raise JqError(f"jq: cannot slice {_type(s)}")
            los = _eval(lo, v) if lo is not None else [None]
            for a in los:
                his = _eval(hi, v) if hi is not None else [None]
                for b in his:
                    if s is None:
                        yield None
                    else:
                        yield s[a if a is not None else 0 : b if b is not None else len(s)]
    elif kind == "neg":
        for a in _eval(node[1], v):
            if not isinstance(a, (int, float)) or isinstance(a, bool):
                raise JqError(f"jq: {_type(a)} cannot be negated")
            yield -a
    elif kind == "arith":
        _, op, lhs, rhs = node
        for a in _eval(lhs, v):
            for b in _eval(rhs, v):
                yield _arith(op, a, b)
    elif kind == "cmp":
        _, op, lhs, rhs = node
        for a in _eval(lhs, v):
            for b in _eval(rhs, v):
                ka, kb = _cmp_key(a), _cmp_key(b)
                try:
                    res = {
                        "==": a == b,
                        "!=": a != b,
                        "<": ka < kb,
                        "<=": ka <= kb,
                        ">": ka > kb,
                        ">=": ka >= kb,
                    }[op]
                except TypeError:
                    res = {
                        "==": a == b,
                        "!=": a != b,
                        "<": str(ka) < str(kb),
                        "<=": str(ka) <= str(kb),
                        ">": str(ka) > str(kb),
                        ">=": str(ka) >= str(kb),
                    }[op]
                yield res
    elif kind == "and":
        for a in _eval(node[1], v):
            if not _truthy(a):
                yield False
            else:
                for b in _eval(node[2], v):
                    yield _truthy(b)
    elif kind == "or":
        for a in _eval(node[1], v):
            if _truthy(a):
                yield True
            else:
                for b in _eval(node[2], v):
                    yield _truthy(b)
    elif kind == "array":
        yield list(_eval(node[1], v)) if node[1] is not None else []
    elif kind == "object":
        yield from _build_object(node[1], 0, {}, v)
    elif kind == "if":
        yield from _eval_if(node[1], node[2], 0, v)
    elif kind == "call":
        yield from _call(node[1], node[2], v)
    else:  # pragma: no cover
        raise JqError(f"jq: bad node {kind}")


def _eval_if(branches, els, i, v):
    if i >= len(branches):
        yield from _eval(els, v)
        return
    cond, then = branches[i]
    for c in _eval(cond, v):
        if _truthy(c):
            yield from _eval(then, v)
        else:
            yield from _eval_if(branches, els, i + 1, v)


def _build_object(fields, i, acc, v):
    if i >= len(fields):
        yield dict(acc)
        return
    key, val = fields[i]
    for k in _eval(key, v):
        if not isinstance(k, str):
            raise JqError("jq: object key must be a string")
        for x in _eval(val, v):
            acc[k] = x
            yield from _build_object(fields, i + 1, acc, v)


def _call(name, args, v):  # noqa: C901 — a builtin dispatch table
    n = len(args)
    if name == "select" and n == 1:
        for c in _eval(args[0], v):
            if _truthy(c):
                yield v
    elif name == "empty" and n == 0:
        return
    elif name == "not" and n == 0:
        yield not _truthy(v)
    elif name == "length" and n == 0:
        if v is None:
            yield 0
        elif isinstance(v, bool):
            raise JqError("jq: boolean has no length")
        elif isinstance(v, (int, float)):
            yield abs(v)
        else:
            yield len(v)
    elif name == "add" and n == 0:
        if not isinstance(v, list):
            raise JqError("jq: add requires an array")
        if not v:
            yield None
        else:
            acc = v[0]
            for x in v[1:]:
                acc = _arith("+", acc, x)
            yield acc
    elif name in ("min", "max") and n == 0:
        if not isinstance(v, list):
            raise JqError(f"jq: {name} requires an array")
        if not v:
            yield None
        else:
            yield (min if name == "min" else max)(v, key=_cmp_key)
    elif name in ("min_by", "max_by") and n == 1:
        if not v:
            yield None
        else:
            yield (min if name == "min_by" else max)(
                v, key=lambda x: _cmp_key(next(_eval(args[0], x)))
            )
    elif name == "keys" and n == 0:
        if isinstance(v, dict):
            yield sorted(v)
        elif isinstance(v, list):
            yield list(range(len(v)))
        else:
            raise JqError(f"jq: {_type(v)} has no keys")
    elif name == "values" and n == 0:
        # jq's `values` selects non-null inputs
        if v is not None:
            yield v
    elif name == "to_entries" and n == 0:
        if not isinstance(v, dict):
            raise JqError("jq: to_entries requires an object")
        yield [{"key": k, "value": v[k]} for k in sorted(v)]
    elif name == "from_entries" and n == 0:
        if not isinstance(v, list):
            raise JqError("jq: from_entries requires an array")
        out = {}
        for e in v:
            k = e.get("key", e.get("k", e.get("name")))
            out[k if isinstance(k, str) else _canon(k)] = e.get(
                "value", e.get("v")
            )
        yield out
    elif name == "tostring" and n == 0:
        yield v if isinstance(v, str) else _canon(v)
    elif name == "tonumber" and n == 0:
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            yield v
        elif isinstance(v, str):
            f = float(v)
            yield _num(f)
        else:
            raise JqError(f"jq: cannot parse {_type(v)} as number")
    elif name == "type" and n == 0:
        yield _type(v)
    elif name == "ascii_upcase" and n == 0:
        if not isinstance(v, str):
            raise JqError("jq: ascii_upcase requires a string")
        yield v.upper()
    elif name == "ascii_downcase" and n == 0:
        if not isinstance(v, str):
            raise JqError("jq: ascii_downcase requires a string")
        yield v.lower()
    elif name == "map" and n == 1:
        if not isinstance(v, list):
            raise JqError("jq: map requires an array")
        out = []
        for x in v:
            out.extend(_eval(args[0], x))
        yield out
    elif name == "has" and n == 1:
        for k in _eval(args[0], v):
            if isinstance(v, dict):
                yield k in v
            elif isinstance(v, list):
                yield isinstance(k, int) and 0 <= k < len(v)
            else:
                raise JqError(f"jq: has() on {_type(v)}")
    elif name == "contains" and n == 1:
        for b in _eval(args[0], v):
            yield _contains(v, b)
    elif name == "reverse" and n == 0:
        if isinstance(v, list):
            yield v[::-1]
        elif isinstance(v, str):
            yield v[::-1]
        else:
            raise JqError("jq: reverse requires an array")
    elif name == "sort" and n == 0:
        if not isinstance(v, list):
            raise JqError("jq: sort requires an array")
        yield sorted(v, key=_cmp_key)
    elif name == "sort_by" and n == 1:
        yield sorted(v, key=lambda x: _cmp_key(next(_eval(args[0], x))))
    elif name == "unique" and n == 0:
        seen, out = set(), []
        for x in sorted(v, key=_cmp_key):
            c = _canon(x)
            if c not in seen:
                seen.add(c)
                out.append(x)
        yield out
    elif name == "join" and n == 1:
        for sep in _eval(args[0], v):
            yield sep.join(
                "" if x is None else (x if isinstance(x, str) else _canon(x))
                for x in v
            )
    elif name == "split" and n == 1:
        for sep in _eval(args[0], v):
            if not isinstance(v, str):
                raise JqError("jq: split requires a string")
            yield v.split(sep)
    elif name == "range":
        its = [list(_eval(a, v)) for a in args]
        if n == 1:
            for hi in its[0]:
                yield from range(int(hi))
        elif n == 2:
            for lo in its[0]:
                for hi in its[1]:
                    yield from range(int(lo), int(hi))
        else:
            for lo in its[0]:
                for hi in its[1]:
                    for st in its[2]:
                        x = lo
                        while (st > 0 and x < hi) or (st < 0 and x > hi):
                            yield x
                            x += st
    elif name == "first":
        if n == 0:
            if not isinstance(v, list):
                raise JqError("jq: first requires an array")
            yield v[0] if v else None
        else:
            for x in _eval(args[0], v):
                yield x
                return
    elif name == "last" and n == 0:
        if not isinstance(v, list):
            raise JqError("jq: last requires an array")
        yield v[-1] if v else None
    elif name == "floor" and n == 0:
        yield math.floor(v)
    elif name == "ceil" and n == 0:
        yield math.ceil(v)
    elif name == "sqrt" and n == 0:
        yield _num(math.sqrt(v))
    elif name == "fabs" and n == 0 or name == "abs" and n == 0:
        yield _num(abs(v))
    elif name == "any" and n == 0:
        yield any(_truthy(x) for x in v)
    elif name == "all" and n == 0:
        yield all(_truthy(x) for x in v)
    elif name == "tojson" and n == 0:
        yield _canon(v)
    elif name == "fromjson" and n == 0:
        yield json.loads(v)
    elif name == "error":
        raise JqError("jq: error" if n == 0 else f"jq: {next(_eval(args[0], v))}")
    else:
        raise JqError(f"jq: unknown function {name}/{n}")


def _contains(a, b) -> bool:
    if isinstance(a, dict) and isinstance(b, dict):
        return all(k in a and _contains(a[k], bv) for k, bv in b.items())
    if isinstance(a, list) and isinstance(b, list):
        return all(any(_contains(x, y) for x in a) for y in b)
    if isinstance(a, str) and isinstance(b, str):
        return b in a
    return a == b


@lru_cache(maxsize=256)
def jq_compile(filter_text: str):
    """Parse a jq filter once; raises JqError on a malformed filter."""
    return _Parser(_lex(filter_text)).parse()


def jq_run(filter_text: str, doc) -> list:
    """Run a compiled jq filter over one parsed JSON value; returns the
    list of output values (jq's output stream)."""
    ast = jq_compile(filter_text)
    return list(_eval(ast, doc))

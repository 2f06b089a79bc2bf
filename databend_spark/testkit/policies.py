"""Row-access policies and masking policies (reference EE governance:
``src/query/ee/src/row_access_policy/``, ``src/query/ee/src/data_mask/``;
SLT suites ``ee/05_ee_ddl/05_0004_ddl_security_policy.test`` and the
``05_0010``-``05_0016`` policy files).

Spark-first model: a policy is pure metadata here — at query time the
runner wraps every FROM/JOIN reference of a governed table in a derived
table that applies the row-policy predicate (WHERE) and the masking
expressions (projection), with the policy's argument names substituted
by the attached columns and ``current_role()`` bound to the session
role. UPDATE/DELETE additionally AND the predicate into their hit
condition (reference DML coverage: mutations only touch visible rows).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def _norm_type(t: str) -> str:
    t = t.strip().strip(",").lower()
    t = re.sub(r"\s+not\s+null$|\s+null$", "", t)
    t = t.split("(")[0]
    aliases = {
        "varchar": "string", "text": "string", "char": "string",
        "integer": "int", "int32": "int", "int64": "bigint",
        "uint8": "int", "uint16": "int", "uint32": "int",
        "uint64": "bigint", "int8": "int", "int16": "int",
        "tinyint": "int", "smallint": "int", "float64": "double",
        "float32": "float", "bool": "boolean",
    }
    return aliases.get(t, t)


_TYPE_GROUPS = {
    "string": "string",
    "int": "num", "bigint": "num", "double": "num", "float": "num",
    "decimal": "num", "boolean": "boolean",
}


def _types_compatible(a: str, b: str) -> bool:
    a, b = _norm_type(a), _norm_type(b)
    if a == b:
        return True
    return _TYPE_GROUPS.get(a) == _TYPE_GROUPS.get(b) == "num"


@dataclass
class Policy:
    name: str
    kind: str  # "row" | "mask"
    args: list  # [(name, decl_type)]
    returns: str
    body: str
    comment: str = ""


@dataclass
class PolicyManager:
    """Per-SLT-file policy state + statement dispatch."""

    policies: dict = field(default_factory=dict)  # name -> Policy
    # bare table -> {"policy": name, "cols": [...]}
    tbl_row: dict = field(default_factory=dict)
    # bare table -> {col: {"policy": name, "using": [cols]}}
    tbl_masks: dict = field(default_factory=dict)

    _re_create = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(ROW\s+ACCESS|MASKING)\s+POLICY"
        r"\s+(IF\s+NOT\s+EXISTS\s+)?([\w`]+)\s+AS\s*\(([^)]*)\)\s*"
        r"RETURNS\s+(\w+)\s*->\s*(.*?)(?:\s+COMMENT\s*=?\s*'((?:[^']|'')*)')?\s*;?\s*$",
        re.I | re.S,
    )
    _re_drop = re.compile(
        r"^\s*DROP\s+(ROW\s+ACCESS|MASKING)\s+POLICY\s+"
        r"(IF\s+EXISTS\s+)?([\w`]+)\s*;?\s*$",
        re.I,
    )
    _re_desc = re.compile(
        r"^\s*DESC(?:RIBE)?\s+(ROW\s+ACCESS|MASKING)\s+POLICY\s+([\w`]+)"
        r"\s*;?\s*$",
        re.I,
    )
    _re_add_row = re.compile(
        r"^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+ROW\s+ACCESS\s+POLICY\s+"
        r"([\w`]+)\s+ON\s*\(([^)]*)\)\s*;?\s*$",
        re.I,
    )
    _re_drop_row = re.compile(
        r"^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+ROW\s+ACCESS\s+POLICY\s+"
        r"([\w`]+)\s*;?\s*$",
        re.I,
    )
    _re_drop_all = re.compile(
        r"^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+ALL\s+ROW\s+ACCESS\s+"
        r"POLICIES\s*;?\s*$",
        re.I,
    )
    _re_set_mask = re.compile(
        r"^\s*ALTER\s+TABLE\s+([\w.`]+)\s+MODIFY\s+COLUMN\s+([\w`]+)\s+"
        r"SET\s+MASKING\s+POLICY\s+([\w`]+)"
        r"(?:\s+USING\s*\(([^)]*)\))?\s*;?\s*$",
        re.I,
    )
    _re_unset_mask = re.compile(
        r"^\s*ALTER\s+TABLE\s+([\w.`]+)\s+MODIFY\s+COLUMN\s+([\w`]+)\s+"
        r"UNSET\s+MASKING\s+POLICY\s*;?\s*$",
        re.I,
    )

    @staticmethod
    def _bare(tbl: str) -> str:
        return tbl.strip("`").split(".")[-1].lower()

    def governed(self) -> set:
        return set(self.tbl_row) | set(self.tbl_masks)

    # -- statement dispatch -------------------------------------------
    def try_handle(self, sql: str, spark, decl_types, table_exists):
        """Returns a DataFrame result if the statement is a policy
        statement, else None. Raises reference-coded errors."""
        m = self._re_create.match(sql)
        if m:
            orep, kindw, ine, name, args_txt, rets, body = (
                m.group(1), m.group(2), m.group(3), m.group(4),
                m.group(5), m.group(6), m.group(7),
            )
            kind = "row" if kindw.upper().startswith("ROW") else "mask"
            name = name.strip("`").lower()
            comment = m.group(8) or ""
            if orep and ine:
                raise ValueError(
                    "[1005] CREATE OR REPLACE and IF NOT EXISTS cannot "
                    "be used together"
                )
            body = body.strip().rstrip(";").strip()
            if kind == "row":
                if re.search(r"\(\s*select\b", body, re.I):
                    raise ValueError(
                        "[1005] subqueries are not allowed in a row "
                        "access policy body"
                    )
                if _norm_type(rets) != "boolean":
                    raise ValueError(
                        "[1005] row access policy must RETURN boolean"
                    )
            args = []
            for a in args_txt.split(","):
                toks = a.strip().split()
                if len(toks) >= 2:
                    args.append((toks[0].strip("`").lower(), toks[1]))
            if kind == "mask":
                if args and not _types_compatible(args[0][1], rets):
                    raise ValueError(
                        "[1121] masking policy return type must match "
                        "the first argument type"
                    )
            prev = self.policies.get(name)
            if prev and prev.kind != kind and not orep:
                raise ValueError(
                    f"[{'2321' if kind == 'mask' else '2324'}] policy "
                    f"name {name} already used by a "
                    f"{'row access' if prev.kind == 'row' else 'masking'}"
                    " policy"
                )
            if prev and not orep and ine:
                return self._empty(spark)
            if prev and not orep and prev.kind == kind:
                raise ValueError(f"[2306] policy {name} already exists")
            self.policies[name] = Policy(
                name, kind, args, rets, body, comment
            )
            return self._empty(spark)
        m = self._re_drop.match(sql)
        if m:
            kind = "row" if m.group(1).upper().startswith("ROW") else "mask"
            name = m.group(3).strip("`").lower()
            pol = self.policies.get(name)
            if not pol or pol.kind != kind:
                if m.group(2):
                    return self._empty(spark)
                raise ValueError(f"[2305] unknown policy {name}")
            if kind == "row":
                attached = [
                    t
                    for t, info in self.tbl_row.items()
                    if info["policy"] == name and table_exists(t)
                ]
                if attached:
                    raise ValueError(
                        f"[1133] row access policy {name} is attached "
                        f"to table {attached[0]}"
                    )
            else:
                attached = [
                    t
                    for t, masks in self.tbl_masks.items()
                    if any(mm["policy"] == name for mm in masks.values())
                    and table_exists(t)
                ]
                if attached:
                    raise ValueError(
                        f"[1133] masking policy {name} is attached to "
                        f"table {attached[0]}"
                    )
            self.policies.pop(name, None)
            # stale attachments on dropped tables are invalid — detach
            # so a later same-name policy does not silently revive them
            for t in [
                t for t, i in self.tbl_row.items() if i["policy"] == name
            ]:
                self.tbl_row.pop(t, None)
            for t in list(self.tbl_masks):
                self.tbl_masks[t] = {
                    c: mm
                    for c, mm in self.tbl_masks[t].items()
                    if mm["policy"] != name
                }
                if not self.tbl_masks[t]:
                    self.tbl_masks.pop(t, None)
            return self._empty(spark)
        m = self._re_desc.match(sql)
        if m:
            kind = "row" if m.group(1).upper().startswith("ROW") else "mask"
            name = m.group(2).strip("`").lower()
            pol = self.policies.get(name)
            if not pol or pol.kind != kind:
                raise ValueError(f"[2305] unknown policy {name}")
            sig = (
                "("
                + ", ".join(f"{n} {t.upper()}" for n, t in pol.args)
                + ")"
            )
            return spark.createDataFrame(
                [(pol.name, sig, pol.returns.upper(), pol.body)],
                "name string, signature string, return_type string, "
                "body string",
            )
        m = self._re_add_row.match(sql)
        if m:
            tbl = self._bare(m.group(1))
            name = m.group(2).strip("`").lower()
            cols = [c.strip().strip("`").lower() for c in m.group(3).split(",")]
            pol = self.policies.get(name)
            if not pol or pol.kind != "row":
                raise ValueError(f"[1131] unknown row access policy {name}")
            if tbl in self.tbl_row:
                raise ValueError(
                    f"[1132] table {tbl} already has a row access policy"
                )
            decl = decl_types(tbl)
            if len(cols) != len(pol.args):
                raise ValueError(
                    "[1114] policy argument count does not match ON list"
                )
            for c, (an, at) in zip(cols, pol.args):
                ct = decl.get(c, "string")
                if not _types_compatible(ct, at):
                    raise ValueError(
                        f"[1114] column {c} type {ct} does not match "
                        f"policy argument {an} {at}"
                    )
            self.tbl_row[tbl] = {"policy": name, "cols": cols}
            return self._empty(spark)
        m = self._re_drop_row.match(sql)
        if m:
            tbl = self._bare(m.group(1))
            name = m.group(2).strip("`").lower()
            pol = self.policies.get(name)
            if not pol or pol.kind != "row":
                raise ValueError(f"[1131] unknown row access policy {name}")
            info = self.tbl_row.get(tbl)
            if not info or info["policy"] != name:
                raise ValueError(
                    f"[1132] row access policy {name} is not attached "
                    f"to table {tbl}"
                )
            self.tbl_row.pop(tbl, None)
            return self._empty(spark)
        m = self._re_drop_all.match(sql)
        if m:
            self.tbl_row.pop(self._bare(m.group(1)), None)
            return self._empty(spark)
        m = self._re_set_mask.match(sql)
        if m:
            tbl = self._bare(m.group(1))
            col = m.group(2).strip("`").lower()
            name = m.group(3).strip("`").lower()
            pol = self.policies.get(name)
            if not pol or pol.kind != "mask":
                raise ValueError(f"[2305] unknown masking policy {name}")
            using = (
                [c.strip().strip("`").lower() for c in m.group(4).split(",")]
                if m.group(4)
                else [col]
            )
            masks = self.tbl_masks.get(tbl, {})
            # a column may be attached to at most ONE security policy —
            # as the masked column or via another mask's USING list
            attached_cols = set(masks)
            if col in attached_cols or attached_cols & set(using):
                hit = col if col in attached_cols else next(
                    iter(attached_cols & set(using))
                )
                raise ValueError(
                    f"[1132] Column '{hit}' is already attached to a "
                    "security policy"
                )
            if m.group(4):
                if len(using) < 2 and len(pol.args) >= 2:
                    raise ValueError(
                        "[2004] USING clause must list the masked "
                        "column and the policy's extra arguments"
                    )
                if using[0] != col:
                    raise ValueError(
                        "[2004] the first column in USING must be the "
                        "masked column itself"
                    )
            if len(using) != len(pol.args):
                raise ValueError(
                    "[1114] masking policy argument count does not "
                    "match the USING list"
                )
            decl = decl_types(tbl)
            for c, (an, at) in zip(using, pol.args):
                ct = decl.get(c, "string")
                if not _types_compatible(ct, at):
                    raise ValueError(
                        f"[1114] column {c} type {ct} does not match "
                        f"policy argument {an} {at}"
                    )
            self.tbl_masks.setdefault(tbl, {})[col] = {
                "policy": name,
                "using": using,
            }
            return self._empty(spark)
        m = self._re_unset_mask.match(sql)
        if m:
            tbl = self._bare(m.group(1))
            col = m.group(2).strip("`").lower()
            self.tbl_masks.get(tbl, {}).pop(col, None)
            if not self.tbl_masks.get(tbl):
                self.tbl_masks.pop(tbl, None)
            return self._empty(spark)
        return None

    # -- reference checks ---------------------------------------------
    def column_locked(self, tbl: str, col: str) -> bool:
        """True when a column is referenced by an attached policy —
        MODIFY/DROP COLUMN must fail with 1132."""
        tbl, col = tbl.lower(), col.lower()
        info = self.tbl_row.get(tbl)
        if info and col in info["cols"]:
            return True
        for c, mm in self.tbl_masks.get(tbl, {}).items():
            if col == c or col in mm["using"]:
                return True
        return False

    def on_table_recreated(self, tbl: str) -> None:
        self.tbl_row.pop(tbl.lower(), None)
        self.tbl_masks.pop(tbl.lower(), None)

    # -- query-time rewriting -----------------------------------------
    def _subst(self, body, args, actual_cols, role, active_roles=()):
        e = body
        e = re.sub(
            r"\bcurrent_role\s*\(\s*\)",
            "'" + role.replace("'", "''") + "'",
            e,
            flags=re.I,
        )
        act = {a.lower() for a in active_roles} | {role.lower()}
        e = re.sub(
            r"\bIS_ROLE_IN_SESSION\s*\(\s*'([^']*)'\s*\)",
            lambda m: "true" if m.group(1).lower() in act else "false",
            e,
            flags=re.I,
        )
        for (an, _t), col in zip(args, actual_cols):
            tgt = (
                ".".join(f"`{p}`" for p in col.split("."))
                if "." in col
                else f"`{col}`"
            )
            e = re.sub(
                rf"(?<![\w`.]){re.escape(an)}(?![\w`])",
                tgt,
                e,
                flags=re.I,
            )
        return e

    def wrapper_sql(self, tbl, columns, role, active_roles=()):
        """Derived-table text applying the row predicate + masks, or
        None when the table is not governed."""
        tbl = tbl.lower()
        info = self.tbl_row.get(tbl)
        masks = self.tbl_masks.get(tbl, {})
        if not info and not masks:
            return None
        proj = []
        for c in columns:
            mm = masks.get(c.lower())
            pol = self.policies.get(mm["policy"]) if mm else None
            if pol:
                expr = self._subst(
                    pol.body, pol.args, mm["using"], role, active_roles
                )
                proj.append(f"({expr}) AS `{c}`")
            else:
                proj.append(f"`{c}`")
        where = ""
        pol = self.policies.get(info["policy"]) if info else None
        if pol:
            pred = self._subst(
                pol.body, pol.args, info["cols"], role, active_roles
            )
            where = f" WHERE coalesce(({pred}), false)"
        if not where and all(p.startswith("`") for p in proj):
            return None  # every attachment points at a dropped policy
        return f"(SELECT {', '.join(proj)} FROM `{tbl}`{where})"

    def row_predicate(self, tbl, role, active_roles=(), qualifier=None):
        """Bare predicate for DML scoping, or None. ``qualifier``
        prefixes the attached columns (MERGE target alias)."""
        info = self.tbl_row.get(tbl.lower())
        pol = self.policies.get(info["policy"]) if info else None
        if not pol:
            return None
        cols = (
            [f"{qualifier}.{c}" for c in info["cols"]]
            if qualifier
            else info["cols"]
        )
        return self._subst(pol.body, pol.args, cols, role, active_roles)

    # -- policy_references TVF ----------------------------------------
    def references_rows(self, policy_name=None, entity=None, iso_db="default"):
        rows = []
        for t, info in self.tbl_row.items():
            pol = self.policies.get(info["policy"])
            if pol:
                rows.append(
                    (
                        pol.name, "ROW ACCESS POLICY", "default", t,
                        "TABLE", None, ", ".join(info["cols"]), "ACTIVE",
                    )
                )
        for t, masks in self.tbl_masks.items():
            for c, mm in masks.items():
                pol = self.policies.get(mm["policy"])
                if not pol:
                    continue
                extra = [u for u in mm["using"] if u != c]
                rows.append(
                    (
                        pol.name, "MASKING POLICY", "default", t,
                        "TABLE", c, ", ".join(extra) or None, "ACTIVE",
                    )
                )
        if policy_name:
            rows = [r for r in rows if r[0] == policy_name.lower()]
        if entity:
            ent = entity.lower().split(".")[-1]
            rows = [r for r in rows if r[3] == ent]
        return rows

    @staticmethod
    def _empty(spark):
        return spark.sql("SELECT 1 AS ok WHERE false")

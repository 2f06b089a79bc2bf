"""MERGE INTO emulation for Spark v1 tables (copy-on-write).

Databend's MERGE (reference: src/query/sql/src/planner/binder/merge_into.rs,
physical merge in storages/fuse) mutates fuse snapshots; Spark v1 parquet
tables support no DML, so the sqllogictest runner rewrites MERGE into a
deterministic SELECT that partitions the target into

    kept      — target rows with no source match (NOT EXISTS on the ON
                condition),
    matched   — target⋈source rows transformed by the first WHEN MATCHED
                clause whose AND-condition holds (UPDATE assigns new
                column values, DELETE drops the row, no clause → keep),
    inserted  — source rows with no target match, shaped by the first
                WHEN NOT MATCHED clause that applies,

then swaps the result in as the new table (same copy-on-write shape the
reference's mutator commits). Multiple-source-match rows follow the
join's multiplicity, like the reference with error-on-multi disabled.
"""

from __future__ import annotations

import re

_MERGE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.`]+)(?:\s+AS\s+(\w+)|\s+(?!USING)(\w+))?"
    r"\s+USING\s*",
    re.I,
)
_WHEN = re.compile(r"\bWHEN\b", re.I)


def _balanced(s: str, i: int) -> int:
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return -1


def _split_top(s: str, sep: str = ",") -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def is_merge(sql: str) -> bool:
    return bool(_MERGE.match(sql))


def parse_merge(sql: str) -> dict:
    m = _MERGE.match(sql)
    target = m.group(1)
    talias = m.group(2) or m.group(3) or target.split(".")[-1].strip("`")
    i = m.end()
    sql_ws = sql
    while i < len(sql_ws) and sql_ws[i] in " \t\n":
        i += 1
    if sql_ws[i] == "(":
        j = _balanced(sql_ws, i)
        source = sql_ws[i : j + 1]
        i = j + 1
    else:
        sm = re.match(r"[\w.`]+", sql_ws[i:])
        source = sm.group(0)
        i += sm.end()
    am = re.match(
        r"\s*(?:AS\s+)?(\w+)?\s*(\(([^)]*)\))?", sql_ws[i:], re.I
    )
    salias, scols = None, None
    if am:
        if am.group(1) and am.group(1).upper() != "ON":
            salias = am.group(1)
            scols = (
                [c.strip().strip("`") for c in am.group(3).split(",")]
                if am.group(3)
                else None
            )
            i += am.end()
    if salias is None:
        salias = source.split(".")[-1].strip("`") if source[0] != "(" else "__src"
    onm = re.match(r"\s*ON\b", sql_ws[i:], re.I)
    if not onm:
        raise ValueError("MERGE without ON")
    i += onm.end()
    wm = _WHEN.search(sql_ws, i)
    cond = sql_ws[i : wm.start() if wm else len(sql_ws)].strip().rstrip(";")
    clauses = []
    while wm:
        nxt = _WHEN.search(sql_ws, wm.end())
        body = sql_ws[wm.end() : nxt.start() if nxt else len(sql_ws)]
        body = body.strip().rstrip(";").strip()
        cm = re.match(
            r"(NOT\s+MATCHED|MATCHED)\s*(?:AND\s+(.*?))?\s*THEN\s+(.*)$",
            body,
            re.I | re.S,
        )
        clauses.append(
            {
                "matched": not cm.group(1).upper().startswith("NOT"),
                "cond": (cm.group(2) or "").strip() or None,
                "action": cm.group(3).strip(),
            }
        )
        wm = nxt
    # the reference rejects an unconditional clause that is not the last
    # of its kind (later clauses would be unreachable)
    for kind in (True, False):
        ofkind = [c for c in clauses if c["matched"] == kind]
        for c in ofkind[:-1]:
            if c["cond"] is None:
                raise ValueError(
                    "MERGE: only the last WHEN [NOT] MATCHED clause may "
                    "omit its AND condition"
                )
    return {
        "target": target,
        "talias": talias,
        "source": source,
        "salias": salias,
        "scols": scols,
        "on": cond,
        "clauses": clauses,
    }



def _null_target_refs(cond: str, ta: str, t: str) -> str:
    """NOT MATCHED conditions see no target row — the reference binds
    target-column refs there to NULL (fuzzer shapes like issue_16885's
    ``WHEN NOT MATCHED AND t40.$1``)."""
    names = {ta, t.split(".")[-1].strip("`")}
    pat = "|".join(re.escape(n) for n in names)
    return re.sub(rf"\b(?:{pat})\.(`[^`]+`|\w+)", "NULL", cond)

def merge_counts(spark, sql: str, rewrite):
    """Databend's MERGE returns affected-row counts as a result row —
    (insert, update, delete) in that order, restricted to the clause
    kinds the statement contains. Computed BEFORE the swap."""
    p = parse_merge(sql)
    t, ta, sa = p["target"], p["talias"], p["salias"]
    src = p["source"]
    src_rel = f"({rewrite(src[1:-1])})" if src.startswith("(") else src
    src_ref = (
        f"{src_rel} {sa}({', '.join(p['scols'])})"
        if p["scols"]
        else f"{src_rel} {sa}"
    )
    on = rewrite(p["on"])
    matched = [c for c in p["clauses"] if c["matched"]]
    unmatched = [c for c in p["clauses"] if not c["matched"]]

    def cc(c):
        return rewrite(c["cond"]) if c["cond"] else "true"

    # error 4001: a target row matched by >1 source row makes UPDATE
    # non-deterministic — the reference refuses (merge_into unstable)
    _upd_conds = [
        cc(c) for c in matched if re.match(r"UPDATE\b", c["action"], re.I)
    ]
    if _upd_conds:
        # only matches that can actually fire an UPDATE count toward
        # non-determinism — a `WHEN MATCHED AND cond` that filters the
        # duplicates out keeps the merge legal (reference checks the
        # appended update rows, not the raw join)
        _guard = " OR ".join(f"({c})" for c in _upd_conds)
        amb = spark.sql(
            f"SELECT count(*) AS n FROM ("
            f"SELECT __ts, count(*) AS c FROM ("
            f"SELECT struct({ta}.*) AS __ts FROM {t} {ta} "
            f"JOIN {src_ref} ON ({on}) AND ({_guard})) __j "
            f"GROUP BY __ts) j JOIN ("
            f"SELECT __ts, count(*) AS c FROM ("
            f"SELECT struct({ta}.*) AS __ts FROM {t} {ta}) __b "
            f"GROUP BY __ts) b ON j.__ts = b.__ts WHERE j.c > b.c"
        ).collect()[0].n
        if amb:
            raise RuntimeError(
                "4001: multiple rows in source match a single row in "
                "target — MERGE UPDATE is non-deterministic"
            )
    n_upd = n_del = 0
    if matched:
        fate_whens = " ".join(
            f"WHEN {cc(c)} THEN {i + 1}" for i, c in enumerate(matched)
        )
        upd = [
            str(i + 1)
            for i, c in enumerate(matched)
            if re.match(r"UPDATE\b", c["action"], re.I)
        ]
        dels = [
            str(i + 1)
            for i, c in enumerate(matched)
            if re.match(r"DELETE\b", c["action"], re.I)
        ]
        tref_rid = (
            f"(SELECT monotonically_increasing_id() AS __rid, * FROM {t}) {ta}"
        )
        row = spark.sql(
            f"SELECT count(CASE WHEN __f IN ({', '.join(upd) or '-1'}) "
            f"THEN 1 END) u, count(CASE WHEN __f IN "
            f"({', '.join(dels) or '-1'}) THEN 1 END) d FROM ("
            f"SELECT __rid, min(CASE WHEN __fate > 0 THEN __fate END) AS __f "
            f"FROM (SELECT {ta}.__rid AS __rid, CASE {fate_whens} ELSE 0 END "
            f"AS __fate FROM {tref_rid} JOIN {src_ref} ON {on}) __p "
            f"GROUP BY __rid) __g"
        ).collect()[0]
        n_upd, n_del = row.u, row.d
    n_ins = 0
    if unmatched:
        prior = []
        for c in unmatched:
            nc = _null_target_refs(cc(c), ta, t)
            guard = " AND ".join([nc] + [f"NOT ({x})" for x in prior]) or "true"
            prior.append(nc)
            n_ins += spark.sql(
                f"SELECT count(*) n FROM {src_ref} WHERE ({guard}) AND "
                f"NOT EXISTS (SELECT 1 FROM {t} {ta} WHERE {on})"
            ).collect()[0].n
    cols, vals = [], []
    if unmatched:
        cols.append("number of rows inserted")
        vals.append(n_ins)
    if any(re.match(r"UPDATE\b", c["action"], re.I) for c in matched):
        cols.append("number of rows updated")
        vals.append(n_upd)
    if any(re.match(r"DELETE\b", c["action"], re.I) for c in matched):
        cols.append("number of rows deleted")
        vals.append(n_del)
    schema = ", ".join(f"`{c}` long" for c in cols)
    return spark.createDataFrame([tuple(vals)], schema)


def merge_to_select(spark, sql: str, rewrite) -> tuple[str, str]:
    """Return (target_table, select_sql) whose result is the post-MERGE
    table content. ``rewrite`` is the dialect rewriter applied to
    embedded expressions (so Databend constructs inside the MERGE work)."""
    p = parse_merge(sql)
    t, ta, sa = p["target"], p["talias"], p["salias"]
    src = p["source"]
    if src.startswith("("):
        src_rel = f"{rewrite(src[1:-1])}"
        src_rel = f"({src_rel})"
    else:
        src_rel = src
    if p["scols"]:
        src_ref = f"{src_rel} {sa}({', '.join(p['scols'])})"
    else:
        src_ref = f"{src_rel} {sa}"
    schema = spark.table(t).schema
    tcols = [f.name for f in schema]
    ttypes = {f.name: f.dataType.simpleString() for f in schema}
    # src_ref already went through rewrite() above — re-applying would
    # double-expand TVF subqueries (numbers() → range() → re-aliased)
    scols = p["scols"] or spark.sql(
        f"SELECT * FROM {src_ref} LIMIT 0"
    ).columns
    star_actions = any(
        re.match(r"(UPDATE|INSERT)\s*\*", c["action"], re.I)
        for c in p["clauses"]
    )
    if star_actions and len(set(scols)) != len(scols):
        raise ValueError(
            "MERGE with UPDATE */INSERT *: duplicate column names in source"
        )
    on = rewrite(p["on"])

    matched = [c for c in p["clauses"] if c["matched"]]
    unmatched = [c for c in p["clauses"] if not c["matched"]]

    def clause_cond(c) -> str:
        return rewrite(c["cond"]) if c["cond"] else "true"

    # ---- matched rows ----
    # per (target-row, source-row) pair: first clause whose condition
    # holds (declaration order). Per target row (__rid), the winning
    # pair is the one with the lowest positive fate — multi-matched
    # rows resolve by clause priority and never duplicate (updates with
    # >1 match are already rejected with error 4001 in merge_counts).
    fate_whens = " ".join(
        f"WHEN {clause_cond(c)} THEN {i + 1}" for i, c in enumerate(matched)
    )
    fate = f"CASE {fate_whens} ELSE 0 END" if matched else "0"
    tref_rid = f"(SELECT monotonically_increasing_id() AS __rid, * FROM {t}) {ta}"
    col_exprs = []
    for col in tcols:
        branches = []
        for i, c in enumerate(matched):
            act = c["action"]
            if re.match(r"DELETE\b", act, re.I):
                continue  # handled by filter
            um = re.match(r"UPDATE\s+SET\s+(.*)$", act, re.I | re.S)
            if um:
                assigns = {}
                for a in _split_top(um.group(1)):
                    k, v = a.split("=", 1)
                    k = k.strip().strip("`")
                    if "." in k:
                        k = k.split(".")[-1].strip("`")
                    if k in assigns:
                        raise ValueError(
                            f"duplicate assignment to column {k} in MERGE"
                        )
                    assigns[k] = rewrite(v.strip())
                if col in assigns:
                    branches.append(
                        f"WHEN __fate = {i + 1} THEN "
                        f"CAST(({assigns[col]}) AS {ttypes[col]})"
                    )
            elif re.match(r"UPDATE\s*\*", act, re.I):
                if col in scols:
                    branches.append(
                        f"WHEN __fate = {i + 1} THEN "
                        f"CAST({sa}.`{col}` AS {ttypes[col]})"
                    )
        if branches:
            col_exprs.append(
                f"CASE {' '.join(branches)} ELSE {ta}.`{col}` END AS `{col}`"
            )
        else:
            col_exprs.append(f"{ta}.`{col}` AS `{col}`")
    delete_fates = [
        str(i + 1)
        for i, c in enumerate(matched)
        if re.match(r"DELETE\b", c["action"], re.I)
    ]
    del_filter = (
        f"WHERE __fate NOT IN ({', '.join(delete_fates)})"
        if delete_fates
        else ""
    )
    # __fate first: the column CASEs reference it as a lateral column
    # alias, which only resolves to PRIOR select-list items
    matched_sql = (
        f"SELECT {', '.join(f'`{c}`' for c in tcols)} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY __rid ORDER BY "
        f"CASE WHEN __fate > 0 THEN __fate ELSE 1000000 END) AS __rn "
        f"FROM (SELECT {ta}.__rid AS __rid, {fate} AS __fate, "
        f"{', '.join(col_exprs)} "
        f"FROM {tref_rid} JOIN {src_ref} ON {on}) __p) __m "
        f"WHERE __rn = 1 {del_filter.replace('WHERE', 'AND') if del_filter else ''}"
    )

    kept_sql = (
        f"SELECT {', '.join(f'{ta}.`{c}`' for c in tcols)} FROM {t} {ta} "
        f"WHERE NOT EXISTS (SELECT 1 FROM {src_ref} WHERE {on})"
    )

    parts = [kept_sql, matched_sql]
    # ---- not-matched source rows, first applicable clause wins ----
    prior = []
    for c in unmatched:
        act = c["action"]
        cc = _null_target_refs(clause_cond(c), ta, t)
        guard = " AND ".join([cc] + [f"NOT ({pc})" for pc in prior]) or "true"
        prior.append(cc)
        im = re.match(
            r"INSERT\s*(?:\(([^)]*)\))?\s*(?:VALUES\s*\((.*)\)|(\*))\s*$",
            act,
            re.I | re.S,
        )
        if not im:
            raise ValueError(f"unsupported MERGE action: {act[:60]}")
        if im.group(3):  # INSERT *
            vals = {
                c2: f"{sa}.`{c2}`" for c2 in tcols if c2 in scols
            }
        else:
            cols = (
                [x.strip().strip("`") for x in im.group(1).split(",")]
                if im.group(1)
                else tcols
            )
            exprs = _split_top(im.group(2))
            if len(exprs) != len(cols):
                raise ValueError(
                    f"MERGE INSERT arity mismatch: {len(exprs)} values "
                    f"for {len(cols)} columns"
                )
            vals = {k: rewrite(v) for k, v in zip(cols, exprs)}
        sel = ", ".join(
            f"CAST(({vals[c2]}) AS {ttypes[c2]}) AS `{c2}`"
            if c2 in vals
            else f"CAST(NULL AS {ttypes[c2]}) AS `{c2}`"
            for c2 in tcols
        )
        parts.append(
            f"SELECT {sel} FROM {src_ref} WHERE ({guard}) AND NOT EXISTS "
            f"(SELECT 1 FROM {t} {ta} WHERE {on})"
        )
    return t, " UNION ALL ".join(f"SELECT * FROM ({x})" for x in parts)

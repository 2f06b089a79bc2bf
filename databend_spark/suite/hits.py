"""ClickBench-hits-style wide-table suite.

Reference: ``benchmark/hits/create.sql`` (105-column web-analytics table)
and ``benchmark/hits/queries/*.sql`` (43 scan/agg queries). The driver
testdata has no hits parquet, so a deterministic 100-column ``hits`` view
is derived from the ``events`` table with portable SQL — the SAME text
runs on Spark and DuckDB, so every query here uses ``oracle='same'``.

What this exercises that the TPC-H suite doesn't: wide-row scans with
column pruning (Catalyst prunes the 100-col view down to the 1-4 columns
each query touches — asserted in tests/test_plans.py style), heavy
COUNT(DISTINCT), multi-aggregate group-bys, and string LIKE/substr
filters over a wide schema.

Scale notes (100 TB): every query is a single scan → partial agg →
shuffle on the group key → final agg; no joins. COUNT(DISTINCT) goes
through Spark's two-phase distinct expansion. Top-N ORDER BY ... LIMIT
fuses to TakeOrderedAndProject. All ORDER BYs carry a deterministic
tie-break so LIMIT rows are engine-stable.
"""

from __future__ import annotations

from databend_spark.suite.base import sql_query

# -- the wide view ----------------------------------------------------------
# 100 columns derived from events(event_id, ts, user_id, event_type, value):
# the ClickBench-semantic columns the queries touch, plus numbered filler
# blocks mirroring hits' Resolution*/Silverlight*/Param* column families.
_SEMANTIC = [
    "event_id AS WatchID",
    "CAST(event_id % 2 AS INT) AS JavaEnable",
    "concat('Title ', event_id % 1000) AS Title",
    "CAST(1 - event_id % 7 % 2 AS INT) AS GoodEvent",
    "ts AS EventTime",
    "CAST(ts AS DATE) AS EventDate",
    "CAST(event_id % 997 AS INT) AS CounterID",
    "CAST(event_id % 65536 AS INT) AS ClientIP",
    "CAST(user_id % 5000 AS INT) AS RegionID",
    "user_id AS UserID",
    "CAST(event_id % 3 AS INT) AS CounterClass",
    "CAST(event_id % 89 AS INT) AS OS",
    "CAST(event_id % 77 AS INT) AS UserAgent",
    "concat('http://example.com/', event_id % 1000, "
    "CASE WHEN event_id % 17 = 0 THEN '/google' ELSE '' END) AS URL",
    "concat('http://ref.example.org/', user_id % 300) AS Referer",
    "CAST(event_id % 13 % 2 AS INT) AS IsRefresh",
    "CASE WHEN event_id % 20 = 0 THEN CAST(event_id % 18 + 1 AS INT) "
    "ELSE 0 END AS AdvEngineID",
    "CAST(1000 + event_id % 920 AS INT) AS ResolutionWidth",
    "CAST(600 + event_id % 480 AS INT) AS ResolutionHeight",
    "CAST(event_id % 32 AS INT) AS ResolutionDepth",
    "CASE WHEN event_id % 10 = 0 THEN concat('phrase ', event_id % 100) "
    "ELSE '' END AS SearchPhrase",
    "CASE WHEN event_id % 10 = 0 THEN CAST(event_id % 5 + 1 AS INT) "
    "ELSE 0 END AS SearchEngineID",
    "CASE WHEN event_id % 7 = 0 THEN concat('model_', event_id % 31) "
    "ELSE '' END AS MobilePhoneModel",
    "CAST(event_id % 7 % 3 AS INT) AS MobilePhone",
    "CAST(event_id % 11 % 2 AS INT) AS IsMobile",
    "CAST(user_id % 256 AS INT) AS IPNetworkID",
    "CAST(event_id % 9 - 4 AS INT) AS TraficSourceID",
    "CAST(event_id % 41 AS INT) AS URLCategoryID",
    "CAST(event_id % 23 % 2 AS INT) AS IsLink",
    "CAST(event_id % 29 % 2 AS INT) AS IsDownload",
    "CAST(event_id % 1000000 AS BIGINT) AS FUniqID",
    "CAST(event_id % 31 AS INT) AS WindowName",
    "CAST(event_id % 19 AS INT) AS OpenerName",
    "CAST(event_id % 12 - 6 AS INT) AS ClientTimeZone",
    "value AS SendTiming",
    "event_type AS PageCharset",
    # columns the later ClickBench queries (36-42) filter on; the *Hash
    # columns use a portable multiplicative hash (identical on DuckDB)
    "CAST(event_id % 33 % 2 AS INT) AS DontCountHits",
    "(event_id * 2654435761) % 1000000007 AS URLHash",
    "(user_id * 2246822519) % 1000000007 AS RefererHash",
    "CAST(1000 + event_id % 800 AS INT) AS WindowClientWidth",
    "CAST(600 + event_id % 400 AS INT) AS WindowClientHeight",
]
_FILLER_INT = [
    f"CAST(event_id % {p} AS INT) AS Filler{i:02d}"
    for i, p in enumerate(
        [37, 43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 97, 101, 103, 107,
         109, 113, 127, 131, 137, 139, 149, 151, 157, 163, 167, 173, 179,
         181, 191, 193, 197, 199, 211, 223, 227, 229, 233, 239, 241]
    )
]
_FILLER_STR = [
    f"concat('f{i}_', user_id % {p}) AS TextFiller{i:02d}"
    for i, p in enumerate([11, 13, 17, 19, 23, 29, 31, 41, 43, 53,
                           59, 61, 71, 73, 79, 83, 89, 101, 103, 107])
]
HITS_SQL = (
    "SELECT " + ", ".join(_SEMANTIC + _FILLER_INT + _FILLER_STR) + " FROM events"
)

N_HITS_COLUMNS = len(_SEMANTIC) + len(_FILLER_INT) + len(_FILLER_STR)


def _hits(body: str) -> str:
    return f"WITH hits AS ({HITS_SQL}) {body}"


# -- ported queries (ClickBench numbering; adapted to the derived view) -----
_QUERIES: dict[str, tuple[str, str]] = {
    "hits_q00": (
        "SELECT CAST(count(*) AS BIGINT) AS c FROM hits",
        "full-table count",
    ),
    "hits_q01": (
        "SELECT CAST(count(*) AS BIGINT) AS c FROM hits WHERE AdvEngineID <> 0",
        "filtered count (predicate on derived col)",
    ),
    "hits_q02": (
        "SELECT CAST(sum(AdvEngineID) AS BIGINT) AS s, "
        "CAST(count(*) AS BIGINT) AS c, avg(ResolutionWidth) AS a FROM hits",
        "sum/count/avg single pass",
    ),
    "hits_q03": (
        "SELECT avg(UserID) AS a FROM hits",
        "avg over bigint",
    ),
    "hits_q04": (
        "SELECT CAST(count(DISTINCT UserID) AS BIGINT) AS u FROM hits",
        "global count-distinct",
    ),
    "hits_q05": (
        "SELECT CAST(count(DISTINCT SearchPhrase) AS BIGINT) AS p FROM hits",
        "count-distinct over mostly-empty string",
    ),
    "hits_q06": (
        "SELECT min(EventDate) AS mn, max(EventDate) AS mx FROM hits",
        "min/max date",
    ),
    "hits_q07": (
        "SELECT AdvEngineID, CAST(count(*) AS BIGINT) AS c FROM hits "
        "WHERE AdvEngineID <> 0 GROUP BY AdvEngineID "
        "ORDER BY c DESC, AdvEngineID",
        "group + order by count",
    ),
    "hits_q08": (
        "SELECT RegionID, CAST(count(DISTINCT UserID) AS BIGINT) AS u "
        "FROM hits GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10",
        "top-10 regions by distinct users",
    ),
    "hits_q09": (
        "SELECT RegionID, CAST(sum(AdvEngineID) AS BIGINT) AS s, "
        "CAST(count(*) AS BIGINT) AS c, avg(ResolutionWidth) AS a, "
        "CAST(count(DISTINCT UserID) AS BIGINT) AS u "
        "FROM hits GROUP BY RegionID ORDER BY c DESC, RegionID LIMIT 10",
        "multi-aggregate group-by with distinct",
    ),
    "hits_q10": (
        "SELECT MobilePhoneModel, CAST(count(DISTINCT UserID) AS BIGINT) AS u "
        "FROM hits WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel "
        "ORDER BY u DESC, MobilePhoneModel LIMIT 10",
        "top phone models by distinct users",
    ),
    "hits_q11": (
        "SELECT MobilePhone, MobilePhoneModel, "
        "CAST(count(DISTINCT UserID) AS BIGINT) AS u FROM hits "
        "WHERE MobilePhoneModel <> '' GROUP BY MobilePhone, MobilePhoneModel "
        "ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10",
        "two-key group with distinct",
    ),
    "hits_q12": (
        "SELECT SearchPhrase, CAST(count(*) AS BIGINT) AS c FROM hits "
        "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
        "ORDER BY c DESC, SearchPhrase LIMIT 10",
        "top search phrases",
    ),
    "hits_q13": (
        "SELECT SearchPhrase, CAST(count(DISTINCT UserID) AS BIGINT) AS u "
        "FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
        "ORDER BY u DESC, SearchPhrase LIMIT 10",
        "top phrases by distinct users",
    ),
    "hits_q14": (
        "SELECT SearchEngineID, SearchPhrase, CAST(count(*) AS BIGINT) AS c "
        "FROM hits WHERE SearchPhrase <> '' "
        "GROUP BY SearchEngineID, SearchPhrase "
        "ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10",
        "engine+phrase group",
    ),
    "hits_q15": (
        "SELECT UserID, CAST(count(*) AS BIGINT) AS c FROM hits "
        "GROUP BY UserID ORDER BY c DESC, UserID LIMIT 10",
        "per-user hit counts",
    ),
    "hits_q19": (
        "SELECT CAST(count(*) AS BIGINT) AS c FROM hits WHERE UserID = 42",
        "point lookup on derived key",
    ),
    "hits_q20": (
        "SELECT CAST(count(*) AS BIGINT) AS c FROM hits "
        "WHERE URL LIKE '%google%'",
        "LIKE filter over URL",
    ),
    "hits_q21": (
        "SELECT SearchPhrase, min(URL) AS mu, CAST(count(*) AS BIGINT) AS c "
        "FROM hits WHERE URL LIKE '%google%' AND SearchPhrase <> '' "
        "GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10",
        "LIKE + group + min(string)",
    ),
    "hits_q23": (
        "SELECT WatchID, EventDate, SearchPhrase FROM hits "
        "WHERE URL LIKE '%google%' "
        "ORDER BY EventDate, WatchID LIMIT 10",
        "wide-filter row fetch with order/limit",
    ),
    "hits_q26": (
        "SELECT CounterID, avg(length(URL)) AS l, "
        "CAST(count(*) AS BIGINT) AS c FROM hits "
        "GROUP BY CounterID HAVING count(*) > 5 "
        "ORDER BY l DESC, CounterID LIMIT 25",
        "avg string length per counter + HAVING",
    ),
    "hits_q31": (
        "SELECT WatchID, ClientIP, CAST(count(*) AS BIGINT) AS c, "
        "CAST(sum(IsRefresh) AS BIGINT) AS r, avg(ResolutionWidth) AS a "
        "FROM hits WHERE SearchPhrase <> '' "
        "GROUP BY WatchID, ClientIP ORDER BY c DESC, WatchID LIMIT 10",
        "high-cardinality two-key group",
    ),
    "hits_q39": (
        "SELECT TraficSourceID, SearchEngineID, AdvEngineID, "
        "CASE WHEN SearchEngineID = 0 AND AdvEngineID = 0 THEN Referer "
        "ELSE '' END AS Src, URL AS Dst, CAST(count(*) AS BIGINT) AS pv "
        "FROM hits GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, "
        "Src, Dst ORDER BY pv DESC, TraficSourceID, Dst, Src LIMIT 10",
        "traffic-source breakdown (5-key group, CASE key)",
    ),
    "hits_q16": (
        "SELECT UserID, SearchPhrase, CAST(count(*) AS BIGINT) AS c "
        "FROM hits GROUP BY UserID, SearchPhrase "
        "ORDER BY c DESC, UserID, SearchPhrase LIMIT 10",
        "user+phrase group, top by count",
    ),
    "hits_q17": (
        # reference has LIMIT with no ORDER BY (nondeterministic); a
        # deterministic tie-break is added so both engines agree
        "SELECT UserID, SearchPhrase, CAST(count(*) AS BIGINT) AS c "
        "FROM hits GROUP BY UserID, SearchPhrase "
        "ORDER BY UserID, SearchPhrase LIMIT 10",
        "group with bare LIMIT (made deterministic)",
    ),
    "hits_q18": (
        "SELECT UserID, extract(minute FROM EventTime) AS m, SearchPhrase, "
        "CAST(count(*) AS BIGINT) AS c FROM hits "
        "GROUP BY UserID, m, SearchPhrase "
        "ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10",
        "group by extracted minute",
    ),
    "hits_q22": (
        "SELECT SearchPhrase, min(URL) AS mu, min(Title) AS mt, "
        "CAST(count(*) AS BIGINT) AS c, "
        "CAST(count(DISTINCT UserID) AS BIGINT) AS u FROM hits "
        "WHERE Title LIKE '%Title 1%' AND URL NOT LIKE '%/google%' "
        "AND SearchPhrase <> '' GROUP BY SearchPhrase "
        "ORDER BY c DESC, SearchPhrase LIMIT 10",
        "LIKE + NOT LIKE + two distinct aggs",
    ),
    "hits_q24": (
        "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' "
        "ORDER BY EventTime, WatchID LIMIT 10",
        "top-N by time (TakeOrderedAndProject)",
    ),
    "hits_q25": (
        "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' "
        "ORDER BY SearchPhrase, WatchID LIMIT 10",
        "top-N by string",
    ),
    "hits_q30": (
        "SELECT SearchEngineID, ClientIP, CAST(count(*) AS BIGINT) AS c, "
        "CAST(sum(IsRefresh) AS BIGINT) AS r, avg(ResolutionWidth) AS a "
        "FROM hits WHERE SearchPhrase <> '' "
        "GROUP BY SearchEngineID, ClientIP "
        "ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10",
        "engine+ip group with 3 aggs",
    ),
    "hits_q32": (
        "SELECT WatchID, ClientIP, CAST(count(*) AS BIGINT) AS c, "
        "CAST(sum(IsRefresh) AS BIGINT) AS r, avg(ResolutionWidth) AS a "
        "FROM hits GROUP BY WatchID, ClientIP "
        "ORDER BY c DESC, WatchID, ClientIP LIMIT 10",
        "highest-cardinality group (per-row keys)",
    ),
    "hits_q33": (
        "SELECT URL, CAST(count(*) AS BIGINT) AS c FROM hits "
        "GROUP BY URL ORDER BY c DESC, URL LIMIT 10",
        "top URLs",
    ),
    "hits_q34": (
        "SELECT CAST(1 AS INT) AS one, URL, CAST(count(*) AS BIGINT) AS c "
        "FROM hits GROUP BY one, URL ORDER BY c DESC, URL LIMIT 10",
        "group by literal + URL",
    ),
    "hits_q35": (
        "SELECT ClientIP, ClientIP - 1 AS c1, ClientIP - 2 AS c2, "
        "ClientIP - 3 AS c3, CAST(count(*) AS BIGINT) AS c FROM hits "
        "GROUP BY ClientIP, c1, c2, c3 "
        "ORDER BY c DESC, ClientIP LIMIT 10",
        "group by arithmetic expressions",
    ),
    "hits_q36": (
        "SELECT URL, CAST(count(*) AS BIGINT) AS PageViews FROM hits "
        "WHERE CounterID = 62 AND EventDate >= DATE '2024-01-05' "
        "AND EventDate <= DATE '2024-01-20' AND DontCountHits = 0 "
        "AND IsRefresh = 0 AND URL <> '' GROUP BY URL "
        "ORDER BY PageViews DESC, URL LIMIT 10",
        "counter + date-range page views",
    ),
    "hits_q37": (
        "SELECT Title, CAST(count(*) AS BIGINT) AS PageViews FROM hits "
        "WHERE CounterID = 62 AND EventDate >= DATE '2024-01-05' "
        "AND EventDate <= DATE '2024-01-20' AND DontCountHits = 0 "
        "AND IsRefresh = 0 AND Title <> '' GROUP BY Title "
        "ORDER BY PageViews DESC, Title LIMIT 10",
        "titles in date range",
    ),
    "hits_q38": (
        "SELECT URL, CAST(count(*) AS BIGINT) AS PageViews FROM hits "
        "WHERE CounterID < 50 AND EventDate >= DATE '2024-01-05' "
        "AND EventDate <= DATE '2024-01-20' AND IsRefresh = 0 "
        "AND IsLink <> 0 AND IsDownload = 0 GROUP BY URL "
        "ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 5",
        "LIMIT+OFFSET pagination",
    ),
    "hits_q40": (
        "SELECT URLHash, EventDate, CAST(count(*) AS BIGINT) AS PageViews "
        "FROM hits WHERE CounterID < 50 AND EventDate >= DATE '2024-01-05' "
        "AND EventDate <= DATE '2024-01-20' AND IsRefresh = 0 "
        "AND TraficSourceID IN (-1, 2) AND RefererHash % 7 = 3 "
        "GROUP BY URLHash, EventDate "
        "ORDER BY PageViews DESC, URLHash, EventDate LIMIT 10 OFFSET 1",
        "hash-filtered pagination",
    ),
    "hits_q41": (
        "SELECT WindowClientWidth, WindowClientHeight, "
        "CAST(count(*) AS BIGINT) AS PageViews FROM hits "
        "WHERE CounterID < 50 AND EventDate >= DATE '2024-01-05' "
        "AND EventDate <= DATE '2024-01-20' AND IsRefresh = 0 "
        "AND DontCountHits = 0 AND URLHash % 13 = 5 "
        "GROUP BY WindowClientWidth, WindowClientHeight "
        "ORDER BY PageViews DESC, WindowClientWidth, WindowClientHeight "
        "LIMIT 10 OFFSET 5",
        "window-size breakdown with offset",
    ),
    "hits_q42": (
        "SELECT CAST(DATE_TRUNC('minute', EventTime) AS STRING) AS M, "
        "CAST(count(*) AS BIGINT) AS PageViews FROM hits "
        "WHERE CounterID < 50 AND EventDate >= DATE '2024-01-10' "
        "AND EventDate <= DATE '2024-01-12' AND IsRefresh = 0 "
        "AND DontCountHits = 0 GROUP BY M ORDER BY M LIMIT 10 OFFSET 2",
        "per-minute time series (timestamp returned as string)",
    ),
}

# Q29: 90 parallel sums over one scan (tests expression-heavy projection;
# DuckDB sums ints into HUGEINT so both sides cast to BIGINT)
_QUERIES["hits_q29"] = (
    "SELECT "
    + ", ".join(
        f"CAST(sum(ResolutionWidth + {i}) AS BIGINT) AS s{i:02d}"
        for i in range(90)
    )
    + " FROM hits",
    "90 simultaneous sums (single-pass multi-aggregate)",
)

for _name, (_body, _doc) in _QUERIES.items():
    sql_query(_name, _hits(_body), oracle="same", doc=_doc)

# Q28: regexp_replace backreference syntax differs ($1 Spark, \1 DuckDB)
# and Spark string literals process backslash escapes; register with a
# dialect-specific oracle.
_Q28_SPARK = _hits(
    "SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\\\.)?([^/]+)/.*$', '$1')"
    " AS k, avg(length(Referer)) AS l, CAST(count(*) AS BIGINT) AS c,"
    " min(Referer) AS mr FROM hits WHERE Referer <> '' GROUP BY k"
    " HAVING count(*) > 5 ORDER BY l DESC, k LIMIT 25"
)
_Q28_DUCK = _hits(
    "SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\.)?([^/]+)/.*$', '\\1')"
    " AS k, avg(length(Referer)) AS l, CAST(count(*) AS BIGINT) AS c,"
    " min(Referer) AS mr FROM hits WHERE Referer <> '' GROUP BY k"
    " HAVING count(*) > 5 ORDER BY l DESC, k LIMIT 25"
)
sql_query(
    "hits_q28",
    _Q28_SPARK,
    oracle=_Q28_DUCK,
    doc="regexp_replace domain extraction (dialect-split backreferences)",
)

"""TPC-DS-pattern suite adapted to the driver's TPC-H-ish tables.

The reference carries the full TPC-DS corpus
(``tests/sqllogictests/suites/tpcds/``, 99 queries over store_sales etc.);
the driver testdata has no TPC-DS tables, so the 10 queries here port the
SIGNATURE SHAPES of the most-cited TPC-DS queries onto orders/lineitem/
customer/part — the point is hardening the grouping/window/set-op/decimal
paths those queries exercise. All SQL is portable (oracle='same': the
identical text runs on Spark and DuckDB).

Shapes covered → original TPC-DS query:
  rollup + grouping()            → q18/q22/q67
  date-dim join + topn           → q3
  multi-channel INTERSECT        → q38
  FULL OUTER of two aggregates   → q97
  rank-within-category window    → q67
  moving average + lag           → q47/q57
  single-scan multi-CASE counts  → q88
  HAVING over avg subquery       → q6
  EXISTS-correlated dim filter   → q10
  UNION ALL channel rollup       → q5

Scale notes: each is scan → partial agg → one shuffle (plus broadcast
dims); the window queries shuffle once on the partition key. No
cartesian products, no per-row UDFs.
"""

from __future__ import annotations

from databend_spark.suite.base import sql_query

_Q: dict[str, tuple[str, str]] = {
    # q22-style: rollup over two attrs with grouping() flags
    "tpcds_rollup_inventory": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(grouping(l_returnflag) AS INT) AS g_rf, "
        "CAST(grouping(l_linestatus) AS INT) AS g_ls, "
        "CAST(sum(l_quantity) AS DECIMAL(20,2)) AS qoh, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) "
        "ORDER BY g_rf, g_ls, l_returnflag, l_linestatus",
        "rollup + grouping flags (q18/q22/q67 shape)",
    ),
    # q3-style: dim join, year extraction, top-n by revenue
    "tpcds_brand_revenue": (
        "SELECT year(o_orderdate) AS d_year, p_brand, "
        "CAST(sum(l_extendedprice * (1 - l_discount)) AS DECIMAL(20,4)) "
        "AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_size < 10 "
        "GROUP BY year(o_orderdate), p_brand "
        "ORDER BY revenue DESC, d_year, p_brand LIMIT 10",
        "date-dim join + brand top-n (q3 shape)",
    ),
    # q38-style: customers present in all three 'channels'
    "tpcds_intersect_channels": (
        "SELECT CAST(count(*) AS BIGINT) AS hot_customers FROM ("
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' "
        "INTERSECT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT "
        "SELECT o_custkey FROM orders WHERE o_totalprice > 1000"
        ") t",
        "multi-channel INTERSECT (q38 shape)",
    ),
    # q97-style: FULL OUTER join of two aggregated channels
    "tpcds_full_outer_channels": (
        "WITH ch1 AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n1 "
        "FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey), "
        "ch2 AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n2 "
        "FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) "
        "SELECT CAST(count(CASE WHEN ch1.k IS NOT NULL AND ch2.k IS NULL "
        "THEN 1 END) AS BIGINT) AS only1, "
        "CAST(count(CASE WHEN ch1.k IS NULL AND ch2.k IS NOT NULL THEN 1 "
        "END) AS BIGINT) AS only2, "
        "CAST(count(CASE WHEN ch1.k IS NOT NULL AND ch2.k IS NOT NULL "
        "THEN 1 END) AS BIGINT) AS both "
        "FROM ch1 FULL OUTER JOIN ch2 ON ch1.k = ch2.k",
        "full-outer of two aggregates (q97 shape)",
    ),
    # q67-style: rank within category over aggregated revenue
    "tpcds_rank_in_category": (
        "SELECT * FROM ("
        "SELECT p_type, p_brand, "
        "CAST(sum(l_extendedprice) AS DECIMAL(20,2)) AS rev, "
        "CAST(rank() OVER (PARTITION BY p_type "
        "ORDER BY CAST(sum(l_extendedprice) AS DECIMAL(20,2)) DESC, "
        "p_brand) AS INT) AS rk "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY p_type, p_brand) t "
        "WHERE rk <= 3 ORDER BY p_type, rk, p_brand",
        "rank within category over agg (q67 shape)",
    ),
    # q47/q57-style: moving average + lag against monthly series
    "tpcds_moving_avg": (
        "WITH monthly AS ("
        "SELECT o_custkey AS k, year(o_orderdate) AS y, "
        "month(o_orderdate) AS m, "
        "CAST(sum(o_totalprice) AS DECIMAL(20,2)) AS tot "
        "FROM orders GROUP BY o_custkey, year(o_orderdate), "
        "month(o_orderdate)) "
        "SELECT k, y, m, tot, "
        "CAST(avg(tot) OVER (PARTITION BY k ORDER BY y, m "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(20,4)) "
        "AS ma3, "
        "lag(tot) OVER (PARTITION BY k ORDER BY y, m) AS prev_tot "
        "FROM monthly WHERE k < 100 ORDER BY k, y, m",
        "moving average + lag (q47/q57 shape)",
    ),
    # q88-style: one scan, many filtered counts
    "tpcds_multi_case_scan": (
        "SELECT "
        "CAST(count(CASE WHEN l_quantity < 10 THEN 1 END) AS BIGINT) AS b1, "
        "CAST(count(CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1 "
        "END) AS BIGINT) AS b2, "
        "CAST(count(CASE WHEN l_quantity >= 20 AND l_quantity < 30 THEN 1 "
        "END) AS BIGINT) AS b3, "
        "CAST(count(CASE WHEN l_quantity >= 30 THEN 1 END) AS BIGINT) AS b4 "
        "FROM lineitem WHERE l_discount BETWEEN 0.02 AND 0.08",
        "single-scan bucketed counts (q88 shape)",
    ),
    # q6-style: rows above a correlated average
    "tpcds_above_avg_customers": (
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n "
        "FROM customer "
        "WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.2 FROM customer) "
        "GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment",
        "filter above scaled global average (q6 shape)",
    ),
    # q10-style: EXISTS-correlated dimension filter
    "tpcds_exists_recent_buyers": (
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n "
        "FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 500) "
        "AND NOT EXISTS ("
        "SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey "
        "AND o2.o_orderstatus = 'P') "
        "GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment",
        "EXISTS / NOT EXISTS correlated filters (q10 shape)",
    ),
    # q5-style: UNION ALL of channels then rollup
    "tpcds_union_rollup": (
        "WITH sales AS ("
        "SELECT 'open' AS channel, o_totalprice AS amt FROM orders "
        "WHERE o_orderstatus = 'O' "
        "UNION ALL "
        "SELECT 'closed' AS channel, o_totalprice AS amt FROM orders "
        "WHERE o_orderstatus = 'F') "
        "SELECT channel, CAST(grouping(channel) AS INT) AS g, "
        "CAST(sum(amt) AS DECIMAL(20,2)) AS total, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM sales GROUP BY ROLLUP (channel) ORDER BY g, channel",
        "union-all channels + rollup (q5 shape)",
    ),
}

for _name, (_body, _doc) in _Q.items():
    sql_query(_name, _body, oracle="same", doc=_doc)

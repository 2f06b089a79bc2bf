"""Scalar & aggregate function surface (SURVEY.md §2.8, §2.4).

Reference registry: ``/root/reference/src/query/functions/src/scalars/``
(~320 base names, golden inventory at
``functions/tests/it/scalars/testdata/function_list.txt``) and aggregates
at ``functions/src/aggregates/aggregator.rs:73``. Spark built-ins cover
~90%; the Databend-name alias layer lives in
``databend_spark.functions.registry``. These queries exercise each
category end-to-end with a DuckDB oracle.

Float determinism notes (see suite/base.py): transcendentals (exp/ln)
are libm-dependent and excluded from oracle-checked outputs; round(x, s)
with s>=1 is tie-free for doubles; variance/corr use explicit formulas
over exact decimal sums so both engines evaluate identical IEEE ops.
"""

from databend_spark.suite.base import sql_query

# --- string functions (scalars/string.rs, 1,353 LoC) -----------------------
sql_query(
    "fn_string",
    """
    SELECT c_custkey,
           length(c_name)                       AS name_len,
           upper(c_name)                        AS uname,
           lower(c_name)                        AS lname,
           substr(c_name, 1, 8)                 AS prefix,
           replace(c_name, '#', '-')            AS repl,
           lpad(c_name, 24, '*')                AS padded,
           rpad(c_name, 24, '.')                AS rpadded,
           trim(concat('  ', c_name, '  '))     AS trimmed,
           reverse(c_name)                      AS rev,
           concat_ws('|', c_name, c_mktsegment) AS joined,
           CAST(instr(c_name, '1') AS BIGINT)   AS pos1,
           (c_name LIKE 'Customer#%')           AS is_cust,
           split_part(c_name, '#', 2)           AS after_hash,
           repeat(c_mktsegment, 2)              AS doubled,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated
    FROM customer WHERE c_custkey <= 200
    """,
)

sql_query(
    "fn_regexp",
    """
    SELECT doc_id,
           regexp_replace(text, '[aeiou]', '_')         AS devowel,
           CAST(length(regexp_replace(text, '[^ ]', '')) + 1 AS BIGINT) AS n_words,
           regexp_extract(text, '([a-z]+)', 1)          AS first_word,
           (text RLIKE 'spark')                         AS mentions_spark
    FROM documents WHERE doc_id < 100
    """,
    oracle="""
    SELECT doc_id,
           regexp_replace(text, '[aeiou]', '_', 'g')    AS devowel,
           CAST(length(regexp_replace(text, '[^ ]', '', 'g')) + 1 AS BIGINT) AS n_words,
           regexp_extract(text, '([a-z]+)', 1)          AS first_word,
           regexp_matches(text, 'spark')                AS mentions_spark
    FROM documents WHERE doc_id < 100
    """,
    doc="Spark regexp_replace is global by default; DuckDB needs the 'g' flag. "
    "RLIKE → regexp_matches.",
)

# --- math (scalars/mathematics/) -------------------------------------------
sql_query(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0)       AS dist,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS up,
           CAST(floor(l_extendedprice) AS BIGINT) AS down,
           round(l_extendedprice, 1)            AS rounded,
           sqrt(l_quantity)                     AS root,
           l_quantity * l_quantity              AS squared,
           CAST(sign(l_extendedprice - 50000.0) AS BIGINT) AS sgn,
           CAST(l_orderkey % 97 AS BIGINT)      AS hash_mod,
           greatest(l_quantity, l_discount * 100.0) AS big,
           least(l_quantity, l_discount * 100.0)    AS small
    FROM lineitem WHERE l_orderkey < 500
    """,
)

# --- date/time (scalars/timestamp/, ~80 fns) --------------------------------
sql_query(
    "fn_datetime",
    """
    SELECT event_id,
           CAST(year(ts)      AS INT) AS y,
           CAST(month(ts)     AS INT) AS mo,
           CAST(day(ts)       AS INT) AS d,
           CAST(hour(ts)      AS INT) AS h,
           CAST(minute(ts)    AS INT) AS mi,
           CAST(second(ts)    AS INT) AS s,
           CAST(quarter(ts)   AS INT) AS q,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(dayofweek(ts) AS INT) AS dow,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           CAST(last_day(ts) AS DATE)            AS month_end,
           CAST(ts AS DATE)                      AS d_only,
           unix_micros(ts)                       AS us
    FROM events WHERE event_id < 100
    """,
    oracle="""
    SELECT event_id,
           CAST(year(ts)      AS INT) AS y,
           CAST(month(ts)     AS INT) AS mo,
           CAST(day(ts)       AS INT) AS d,
           CAST(hour(ts)      AS INT) AS h,
           CAST(minute(ts)    AS INT) AS mi,
           CAST(second(ts)    AS INT) AS s,
           CAST(quarter(ts)   AS INT) AS q,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           CAST(last_day(ts) AS DATE)            AS month_end,
           CAST(ts AS DATE)                      AS d_only,
           epoch_us(ts)                          AS us
    FROM events WHERE event_id < 100
    """,
    doc="dayofweek: Spark 1=Sunday..7, DuckDB 0=Sunday..6; epoch: "
    "unix_micros ↔ epoch_us. second() truncates in both.",
)

sql_query(
    "fn_date_arith",
    """
    SELECT o_orderkey,
           date_add(CAST(o_orderdate AS DATE), 30)                    AS due,
           add_months(CAST(o_orderdate AS DATE), 3)                   AS due_q,
           datediff(DATE '2000-01-01', CAST(o_orderdate AS DATE))     AS days_to_y2k,
           make_date(CAST(year(o_orderdate) AS INT), 1, 1)            AS year_start,
           to_date('1999-12-31')                                      AS lit_date
    FROM orders WHERE o_orderkey < 300
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30                             AS due,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS due_q,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2000-01-01') AS INT)                  AS days_to_y2k,
           make_date(CAST(year(o_orderdate) AS INT), 1, 1)            AS year_start,
           CAST('1999-12-31' AS DATE)                                 AS lit_date
    FROM orders WHERE o_orderkey < 300
    """,
    doc="date_add/add_months/datediff alias layer (reference "
    "scalars/timestamp/ add_months, date_add, date_diff, between_days).",
)

# --- hash functions (scalars/hash.rs) ---------------------------------------
sql_query(
    "fn_hash",
    """
    SELECT c_custkey,
           md5(c_name)          AS h_md5,
           sha2(c_name, 256)    AS h_sha256
    FROM customer WHERE c_custkey <= 100
    """,
    oracle="""
    SELECT c_custkey,
           md5(c_name)          AS h_md5,
           sha256(c_name)       AS h_sha256
    FROM customer WHERE c_custkey <= 100
    """,
)

sql_query(
    "fn_hash_native",
    # xxhash64 / murmur3 `hash` are Spark-native (reference city64/siphash
    # analog, scalars/hash.rs) — no portable oracle.
    """
    SELECT c_custkey,
           xxhash64(c_name)  AS h_xx,
           hash(c_name)      AS h_murmur,
           crc32(c_name)     AS h_crc
    FROM customer WHERE c_custkey <= 100
    """,
    oracle=None,
)

# --- JSON / variant (scalars/variant.rs, 3,609 LoC) --------------------------
sql_query(
    "fn_json",
    """
    SELECT event_id,
           get_json_object(props, '$.k')                     AS k_str,
           CAST(get_json_object(props, '$.k') AS INT)        AS k_int,
           get_json_object(props, '$.missing')               AS absent,
           from_json(props, 'k INT').k                       AS parsed_k,
           to_json(named_struct('id', event_id, 'type', event_type)) AS packed
    FROM events WHERE event_id < 200
    """,
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT)    AS k_int,
           json_extract_string(props, '$.missing')           AS absent,
           CAST(json_extract(props, '$.k') AS INT)           AS parsed_k,
           concat('{"id":', event_id, ',"type":"', event_type, '"}') AS packed
    FROM events WHERE event_id < 200
    """,
    doc="Variant/JSON path access (reference json_path_query family).",
)

# --- arrays + higher-order functions (scalars/array.rs + lambda) -------------
sql_query(
    "fn_array_hof",
    """
    WITH toks AS (
        SELECT doc_id, split(text, ' ') AS tokens FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(size(tokens) AS BIGINT)                            AS n_tokens,
           CAST(size(array_distinct(tokens)) AS BIGINT)            AS n_uniq,
           array_contains(tokens, 'spark')                          AS has_spark,
           element_at(array_sort(tokens), 1)                        AS first_token,
           CAST(size(filter(tokens, t -> length(t) > 4)) AS BIGINT) AS n_long,
           CAST(aggregate(tokens, 0, (acc, t) -> acc + length(t)) AS BIGINT) AS total_chars,
           array_join(slice(array_sort(array_distinct(tokens)), 1, 3), ',') AS first3
    FROM toks
    """,
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT)                              AS n_tokens,
           CAST(len(list_distinct(tokens)) AS BIGINT)               AS n_uniq,
           list_contains(tokens, 'spark')                           AS has_spark,
           list_sort(tokens)[1]                                     AS first_token,
           CAST(len(list_filter(tokens, t -> length(t) > 4)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT) AS total_chars,
           array_to_string(list_slice(list_sort(list_distinct(tokens)), 1, 3), ',') AS first3
    FROM toks
    """,
    doc="HOF lambdas: transform/filter/aggregate ↔ list_transform/"
    "list_filter/list_sum (reference lambda UDFs in binder).",
)

sql_query(
    "fn_struct_map",
    """
    SELECT n_nationkey,
           named_struct('name', n_name, 'region', n_regionkey).name AS s_name,
           map('key', n_nationkey, 'region', n_regionkey)['region'] AS m_region,
           CAST(size(map('a', 1, 'b', 2)) AS BIGINT)                AS m_size
    FROM nation
    """,
    oracle="""
    SELECT n_nationkey,
           {'name': n_name, 'region': n_regionkey}.name             AS s_name,
           map_extract(MAP {'key': n_nationkey, 'region': n_regionkey}, 'region')[1] AS m_region,
           CAST(cardinality(MAP {'a': 1, 'b': 2}) AS BIGINT)        AS m_size
    FROM nation
    """,
    doc="Tuple→struct, Map type (§1.2 type mapping).",
)

# --- conditionals (scalars/control.rs) ---------------------------------------
sql_query(
    "fn_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'big'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'small' END                          AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open')   AS status,
           if(o_orderpriority = '1-URGENT', 1, 0)         AS urgent,
           CAST(o_totalprice AS DOUBLE) / nullif(CAST(o_orderkey % 3 AS INT), 0) AS safe_div
    FROM orders WHERE o_orderkey < 400
    """,
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'big'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'small' END                          AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open')   AS status,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
           CAST(o_totalprice AS DOUBLE) / nullif(CAST(o_orderkey % 3 AS INT), 0) AS safe_div
    FROM orders WHERE o_orderkey < 400
    """,
)

# --- aggregate functions (aggregates/aggregator.rs:73, 68 names) -------------
sql_query(
    "agg_variance_corr",
    # Explicit moment formulas over exact decimal sums → identical IEEE
    # double ops in both engines (engine-native var_samp accumulates
    # doubles in engine-specific order → last-ulp drift).
    """
    WITH sums AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))
                        * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_discount AS DECIMAL(18,4))
                        * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))
                        * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxx - sx * sx / n) / (n - 1)                       AS var_samp_qty,
           (sxx - sx * sx / n) / n                             AS var_pop_qty,
           sqrt((sxx - sx * sx / n) / (n - 1))                 AS stddev_qty,
           (sxy - sx * sy / n) / (n - 1)                       AS covar_qty_disc,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_disc
    FROM sums
    """,
)

sql_query(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey)  AS uniq_parts,
           count(DISTINCT l_suppkey)  AS uniq_supps,
           count(*)                   AS n,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)

sql_query(
    "agg_bool_countif",
    """
    SELECT user_id,
           bool_or(event_type = 'purchase')            AS ever_bought,
           bool_and(value IS NOT NULL)                 AS all_valued,
           count_if(event_type = 'click')              AS n_clicks,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
    FROM events GROUP BY user_id
    """,
    doc="bool_and/bool_or/count_if (reference aggregates + _if combinator "
    "desugar sum(if(cond,x,0)), aggregates/adaptors/).",
)

sql_query(
    "agg_string_collect",
    """
    SELECT c_nationkey,
           array_join(array_sort(collect_set(c_mktsegment)), ',') AS segments,
           CAST(size(collect_set(c_mktsegment)) AS BIGINT)        AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT)                 AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    doc="array_agg/string_agg/listagg family (reference string_agg, "
    "array_agg at aggregator.rs).",
)

sql_query(
    "agg_percentile_median",
    # l_quantity values are integral doubles → interpolation at quarter
    # points is exact dyadic arithmetic, deterministic in both engines.
    """
    SELECT l_returnflag,
           CAST(percentile(l_quantity, 0.5)  AS DOUBLE) AS median_qty,
           CAST(percentile(l_quantity, 0.25) AS DOUBLE) AS p25_qty,
           CAST(percentile(l_quantity, 0.75) AS DOUBLE) AS p75_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_quantity, 0.5)  AS DOUBLE) AS median_qty,
           CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25_qty,
           CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)

sql_query(
    "agg_argmax",
    """
    SELECT c_nationkey,
           max_by(c_name, struct(c_acctbal, c_custkey)) AS richest,
           min_by(c_name, struct(c_acctbal, c_custkey)) AS poorest
    FROM customer GROUP BY c_nationkey
    """,
    oracle="""
    WITH ranked AS (
        SELECT c_nationkey, c_name,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey DESC) AS rd,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal ASC, c_custkey ASC)  AS ra
        FROM customer
    )
    SELECT c_nationkey,
           max(CASE WHEN rd = 1 THEN c_name END) AS richest,
           max(CASE WHEN ra = 1 THEN c_name END) AS poorest
    FROM ranked GROUP BY c_nationkey
    """,
    doc="arg_max/arg_min with composite tie-break (reference arg_min_max).",
)

sql_query(
    "agg_bitwise",
    """
    SELECT c_nationkey,
           bit_and(c_custkey) AS band,
           bit_or(c_custkey)  AS bor,
           bit_xor(c_custkey) AS bxor
    FROM customer GROUP BY c_nationkey
    """,
)

sql_query(
    "agg_approx",
    # approx_count_distinct (HLL) / approx percentile (reference
    # aggregate_approx_count_distinct.rs, quantile_tdigest) — sketch
    # outputs are engine-specific; driver records rows-only.
    """
    SELECT l_returnflag,
           approx_count_distinct(l_partkey)                    AS approx_parts,
           CAST(approx_percentile(l_extendedprice, 0.5) AS DOUBLE) AS approx_median
    FROM lineitem GROUP BY l_returnflag
    """,
    oracle=None,
)


# --- _state/_merge combinators (aggregate_combinator_state.rs) -------------
# Mergeable partial-aggregate states: fine-granularity states are merged
# up to coarser keys without rescanning the fact table — the
# aggregating-index pattern (reference suites/query/index/
# 02_aggregating_index). Oracle is the equivalent single-pass aggregate:
# state+merge must be indistinguishable from direct aggregation.
def _agg_state_merge(spark, sf_dir):
    from pyspark.sql import functions as F

    from databend_spark.operators.agg_state import (
        StateSpec,
        merge_states,
        partial_states,
    )

    li = spark.table("lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.month("l_shipdate").alias("ship_month"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    specs = [
        StateSpec("sum", "qty", "sum_qty_state"),
        StateSpec("count", "qty", "count_order"),
        StateSpec("min", "price", "min_price"),
        StateSpec("max", "price", "max_price"),
    ]
    fine = partial_states(
        li, ["l_returnflag", "l_linestatus", "ship_month"], specs
    )
    merged = merge_states(fine, ["l_returnflag", "l_linestatus"], specs)
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty_state").cast("double").alias("sum_qty"),
        F.col("count_order").cast("bigint").alias("count_order"),
        (
            F.col("sum_qty_state").cast("double") / F.col("count_order")
        ).alias("avg_qty"),
        "min_price",
        "max_price",
    )


def _agg_state_uniq(spark, sf_dir):
    # HLL-sketch states (uniq_state analog): estimates are
    # sketch-implementation-specific → rows-only driver check; exactness
    # of the merge itself is pinned in tests/test_agg_state.py.
    from pyspark.sql import functions as F

    from databend_spark.operators.agg_state import (
        StateSpec,
        merge_states,
        partial_states,
    )

    o = spark.table("orders").select(
        "o_orderstatus", F.month("o_orderdate").alias("m"), "o_custkey"
    )
    specs = [StateSpec("uniq", "o_custkey", "uniq_custs")]
    fine = partial_states(o, ["o_orderstatus", "m"], specs)
    return merge_states(fine, ["o_orderstatus"], specs)


def _register_state_queries():
    from databend_spark.suite.base import register

    register(
        "agg_state_merge",
        oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(count(l_quantity) AS BIGINT) AS count_order,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / count(l_quantity) AS avg_qty,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        doc="_state/_merge combinator pipeline == direct aggregation",
    )(_agg_state_merge)
    register("agg_state_uniq", oracle=None)(_agg_state_uniq)


_register_state_queries()


# --- round-3 additions: discrete quantiles, boundary date_diff, exact
# hashes (reference aggregates/aggregate_quantile_disc.rs,
# scalars/timestamp date_diff, scalars/hash.rs) ----------------------------
sql_query(
    "agg_quantile_disc",
    """
    SELECT o_orderpriority,
           CAST(element_at(sort_array(collect_list(CAST(o_totalprice AS
                 DOUBLE))), CAST(ceil(0.5 * count(o_totalprice)) AS INT))
                 AS DOUBLE) AS p50,
           CAST(element_at(sort_array(collect_list(CAST(o_totalprice AS
                 DOUBLE))), CAST(ceil(0.9 * count(o_totalprice)) AS INT))
                 AS DOUBLE) AS p90
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
           quantile_disc(CAST(o_totalprice AS DOUBLE), 0.9) AS p90
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="discrete quantiles: the actual element at ceil(p*n) (1-based) "
    "of the sorted values — DuckDB's quantile_disc rule; the "
    "reference's aggregate_quantile_disc.rs floors at p*(n-1)",
)

sql_query(
    "fn_date_diff_boundaries",
    """
    SELECT o_orderkey,
           (year(o_shipdate) - year(o_orderdate)) AS dy,
           ((year(o_shipdate) * 12 + month(o_shipdate))
            - (year(o_orderdate) * 12 + month(o_orderdate))) AS dm,
           datediff(o_shipdate, o_orderdate) AS dd
    FROM (SELECT o_orderkey, o_orderdate,
                 date_add(CAST(o_orderdate AS DATE),
                          CAST(o_orderkey % 1000 AS INT)) AS o_shipdate
          FROM orders WHERE o_orderkey <= 20000) t
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           date_diff('year', CAST(o_orderdate AS DATE), o_shipdate) AS dy,
           date_diff('month', CAST(o_orderdate AS DATE), o_shipdate) AS dm,
           date_diff('day', CAST(o_orderdate AS DATE), o_shipdate) AS dd
    FROM (SELECT o_orderkey, o_orderdate,
                 CAST(o_orderdate AS DATE)
                   + CAST(o_orderkey % 1000 AS INT) AS o_shipdate
          FROM orders WHERE o_orderkey <= 20000) t
    ORDER BY o_orderkey
    """,
    doc="boundary-crossing date_diff semantics (reference "
    "date_helper.rs Eval*Impl): year/month component deltas and "
    "calendar-day counts — DuckDB's date_diff counts the same "
    "boundary crossings",
)

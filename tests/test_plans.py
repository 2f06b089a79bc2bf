"""Plan-shape regression tests — the properties that matter at 100 TB.

Mirrors the reference's EXPLAIN/join_order sqllogictests: instead of
golden text we assert the structural facts (pushdown, pruning,
broadcast, codegen, partial agg, TopN fusion) so Catalyst upgrades don't
silently regress scale behavior.
"""

import pytest
from pyspark.sql import functions as F

from databend_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_partial_aggregation,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_top_n,
    assert_whole_stage_codegen,
)
from databend_spark.session import register_tables
from databend_spark.suite import queries


@pytest.fixture(scope="module", autouse=True)
def _tables(spark, sf_dir):
    register_tables(spark, sf_dir)


def test_filter_pushdown_reaches_parquet(spark):
    df = spark.table("lineitem").filter(F.col("l_quantity") < 5).select(
        "l_orderkey"
    )
    assert_pushed_filters(df, "LessThan(l_quantity")


def test_column_pruning(spark):
    df = spark.table("lineitem").select("l_orderkey", "l_quantity")
    assert_read_schema_only(df, "lineitem", {"l_orderkey", "l_quantity"})


def test_tpch_q3_prunes_and_pushes(spark, sf_dir):
    df = queries()["tpch_q3"](spark, sf_dir)
    # the BUILDING predicate must reach the customer scan
    assert_pushed_filters(df, "EqualTo(c_mktsegment,BUILDING)")
    assert_whole_stage_codegen(df)
    assert_no_cartesian(df)


def test_small_dims_broadcast(spark, sf_dir):
    df = queries()["tpch_q5"](spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_aggregation_is_partial_then_final(spark, sf_dir):
    df = queries()["tpch_q1"](spark, sf_dir)
    assert_partial_aggregation(df)
    assert_whole_stage_codegen(df)


def test_topn_fuses(spark):
    df = (
        spark.table("orders")
        .orderBy(F.col("o_totalprice").desc())
        .limit(10)
    )
    assert_top_n(df)


def test_semi_join_not_materialized(spark, sf_dir):
    from databend_spark.plans import physical_plan

    df = queries()["tpch_q4"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan or "ExistenceJoin" in plan, plan


def test_minhash_has_no_cartesian(spark, sf_dir):
    # pin the pre-checkpoint pair plan (the public fn eagerly
    # materializes, which would hide the join shape behind a scan)
    from databend_spark.operators.dedup import (
        _minhash_lsh_pairs_inner,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text", 32, 3)
    df = _minhash_lsh_pairs_inner(sigs, 8, 4, 0.8)
    assert_no_cartesian(df)


def test_ngram_pair_plan_no_sizes_broadcast(spark, sf_dir):
    """The per-doc sizes relation is O(n_docs) — an explicit broadcast
    hint on it is a driver OOM at corpus scale. Pin: no hint in the
    logical plan (AQE may still broadcast at runtime when small) and no
    cartesian product."""
    from databend_spark.operators.dedup import _ngram_pair_plan, shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = (
        shingles(docs.select("doc_id", "text"), "text", 3)
        .select(F.col("doc_id").alias("doc"), F.explode("shingles").alias("s"))
        .select("doc", F.xxhash64("s").alias("sh"))
    )
    df = _ngram_pair_plan(ex, 0.8)
    assert_no_cartesian(df)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical, logical
    assert "UnresolvedHint" not in logical, logical


def test_ngram_pair_plan_no_sort_no_window(spark, sf_dir):
    """The stop-shingle DF cap must be the hot-key anti-join (r10), not
    a count Window: a Window forces a full Sort of the exploded (doc,
    sh) stream — O(n log n) + spill at corpus scale — re-executed once
    per consumer branch. Pin: zero Sort and zero Window operators in the
    physical pair plan (pair generation is a hash self-equi-join on the
    shingle; nothing needs ordering)."""
    from databend_spark.operators.dedup import _ngram_pair_plan, shingles
    from databend_spark.plans import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = (
        shingles(docs.select("doc_id", "text"), "text", 3)
        .select(F.col("doc_id").alias("doc"), F.explode("shingles").alias("s"))
        .select("doc", F.xxhash64("s").alias("sh"))
    )
    plan = physical_plan(_ngram_pair_plan(ex, 0.8, max_df=1000))
    assert "Window" not in plan, plan
    # the Sort OPERATOR renders as "Sort [ordering]" — this also catches
    # SortMergeJoin's required child sorts without tripping on names
    # like SortAggregate (none expected either way)
    assert "Sort [" not in plan, plan


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    """The asof union-window plan must contain zero join operators —
    that's the point of the rewrite (no per-key cross product)."""
    from databend_spark.plans import physical_plan

    df = queries()["join_asof"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_hits_wide_view_prunes_to_base_columns(spark, sf_dir):
    """The 97-column hits view must not defeat column pruning: a query
    touching only AdvEngineID (derived from event_id) should scan ONLY
    event_id from the events parquet."""
    from databend_spark.plans import assert_read_schema_only
    from databend_spark.session import register_tables
    from databend_spark.suite.hits import HITS_SQL, N_HITS_COLUMNS

    assert N_HITS_COLUMNS >= 95
    register_tables(spark, sf_dir)
    df = spark.sql(
        f"WITH hits AS ({HITS_SQL}) "
        "SELECT count(*) AS c FROM hits WHERE AdvEngineID <> 0"
    )
    assert_read_schema_only(df, "events", {"event_id"})


def test_spatial_join_plan_no_cartesian(spark, sf_dir):
    """Grid-bucketed spatial join equi-joins on cell keys — no
    CartesianProduct / BroadcastNestedLoop anywhere in the plan."""
    from databend_spark.plans import assert_no_cartesian
    from databend_spark.suite import queries

    df = queries()["geo_spatial_join"](spark, sf_dir)
    assert_no_cartesian(df)


def test_ivf_build_centroid_pick_is_take_ordered(spark, sf_dir):
    """ivf_build's centroid sample must fuse to TakeOrderedAndProject
    (distributed partial top-k), NOT a no-partition Window over the full
    corpus — the r2 verdict's scale-killer. Since r9 the sample collapses
    to one array row by sort_array+collect_list: no Window at all, and
    the corpus assignment is a per-row argmax expression with zero
    exchanges of the corpus (the r8 crossJoin+row_number shape shuffled
    it 16×)."""
    from databend_spark.operators.similarity import _ivf_sample, ivf_build
    from databend_spark.plans import physical_plan
    from databend_spark.session import load_table

    corpus = load_table(spark, f"{sf_dir}/embeddings.parquet")
    sample_plan = physical_plan(
        _ivf_sample(corpus, 8, "vec_id", "embedding")
    )
    assert "TakeOrderedAndProject" in sample_plan, sample_plan
    assert "Window" not in sample_plan, sample_plan
    _, assigned = ivf_build(corpus, ncells=8)
    assigned_plan = physical_plan(assigned)
    assert "Window" not in assigned_plan, assigned_plan
    # corpus side must not be DATA-shuffled for assignment (the r8 shape
    # exchanged the corpus 16x for the crossJoin+Window argmax): allowed
    # Exchanges are the broadcast of the single centroid row and at most
    # ONE RoundRobinPartitioning — dedup._spread parallelizing an
    # under-split small scan (no-op on warehouse inputs; r10)
    low = assigned_plan.lower()
    assert "hashpartitioning" not in low, assigned_plan
    assert "rangepartitioning" not in low, assigned_plan
    assert low.count("roundrobinpartitioning") <= 1, assigned_plan


def test_bm25_plan_broadcasts_term_stats(spark, sf_dir):
    """BM25 search: the per-term df/idf side is broadcast, and no
    cartesian join appears (the single-row corpus-stats crossJoin is a
    broadcast nested loop of one row — explicitly allowed)."""
    from databend_spark.plans import physical_plan
    from databend_spark.suite import queries

    df = queries()["fts_bm25_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan

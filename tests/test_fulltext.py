"""Full-text search operator tests (inverted index + BM25)."""

from __future__ import annotations

from databend_spark.operators.fulltext import (
    build_inverted_index,
    match_all,
    match_any,
    search_bm25,
)


def _corpus(spark):
    rows = [
        (1, "spark joins hash tables fast"),
        (2, "hash hash hash collisions"),
        (3, "sort merge join for big tables"),
        (4, "a totally unrelated sentence about cats"),
        (5, "fast hash join fast"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_postings(spark):
    postings, doclens = build_inverted_index(_corpus(spark), "doc_id", "text")
    p = {(r.term, r.doc_id): r.tf for r in postings.collect()}
    assert p[("hash", 2)] == 3
    assert p[("fast", 5)] == 2
    dl = {r.doc_id: r.dl for r in doclens.collect()}
    assert dl[1] == 5 and dl[4] == 6


def test_match_any_all(spark):
    df = _corpus(spark).select(
        "doc_id",
        match_any("text", "hash cats").alias("any_m"),
        match_all("text", "hash join").alias("all_m"),
    )
    got = {r.doc_id: (r.any_m, r.all_m) for r in df.collect()}
    assert got[1] == (True, False)  # has hash, no 'join' token ('joins')
    assert got[4] == (True, False)
    assert got[5] == (True, True)
    assert got[3] == (False, False)


def test_bm25_ranking_prefers_rare_term_density(spark):
    postings, doclens = build_inverted_index(_corpus(spark), "doc_id", "text")
    top = search_bm25(postings, doclens, "hash join", k=5).collect()
    ids = [r.doc_id for r in top]
    assert ids[0] == 5  # contains both terms, short doc
    assert 4 not in ids  # no query terms at all
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_query(spark):
    postings, doclens = build_inverted_index(_corpus(spark), "doc_id", "text")
    assert search_bm25(postings, doclens, "  ... ", k=5).count() == 0


def test_index_persists_clustered_by_term(spark, tmp_path):
    from databend_spark.sources.clustering import cluster_write

    postings, _ = build_inverted_index(_corpus(spark), "doc_id", "text")
    path = str(tmp_path / "idx")
    cluster_write(postings, path, ["term"], num_files=2)
    back = spark.read.parquet(path)
    # pruned read of one posting list matches the unpersisted postings
    want = {(r.doc_id, r.tf) for r in postings.filter("term = 'hash'").collect()}
    got = {(r.doc_id, r.tf) for r in back.filter("term = 'hash'").collect()}
    assert got == want

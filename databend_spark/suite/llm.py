"""LLM training-data pipeline operators (north-star suite).

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity
search (brute-force + LSH ANN), text analysis (lang-ID, quality, token
counting, fingerprints), multimodal binary plumbing. Operators live in
``databend_spark.operators.{dedup,similarity,text,multimodal}``; this
module wires them to the driver's documents/embeddings tables with
DuckDB oracles wherever the computation is SQL-expressible.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databend_spark.suite.base import register

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "llm_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents
    GROUP BY lang, source
    HAVING count(*) > 1
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (hash-groupBy on the dedup key). The driver's
    documents have no exact text duplicates, so the demo key is
    (lang, source); the operator is key-agnostic."""
    from databend_spark.operators.dedup import exact_dedup

    return exact_dedup(
        spark.table("documents"), ["lang", "source"], "doc_id"
    ).select("keeper_id", "n_copies")


_JACCARD_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                         range(1, len(t) - 1),
                         i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM toks
    ),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT da, db, inter,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = da
    JOIN sizes sb ON sb.doc_id = db
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
"""


@register("llm_dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram shingle Jaccard ≥ 0.8 — shuffle on the
    shingle, pair-count = intersection, broadcast set sizes."""
    from databend_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        spark.table("documents"), "doc_id", "text", n=3, threshold=0.8
    )


@register(
    "llm_dedup_minhash_lsh",
    # LSH finds candidates; candidates are verified against exact shingle
    # Jaccard, so when recall is total (as on this corpus — validated in
    # tests/test_llm_ops.py) the output equals the exact pair set.
    oracle="SELECT da, db, jaccard FROM (" + _JACCARD_ORACLE + ") t",
)
def llm_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (32 hashes) + banded LSH (8 bands × 4 rows) + exact
    verification at Jaccard ≥ 0.8."""
    from databend_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        spark.table("documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        verify_threshold=0.8,
    )


@register("llm_dedup_simhash", oracle=None)  # xxhash64 bits — not portable SQL
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup candidates (Hamming ≤ 3) via pigeonhole
    16-bit-chunk bucketing."""
    from databend_spark.operators.dedup import simhash_pairs

    return simhash_pairs(spark.table("documents"), "doc_id", "text", max_hamming=3)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# Sequential in-order double fold — bit-exact match with Spark's
# aggregate() left-to-right fold (see operators/similarity.dot_product).
def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


_ANN_ORACLE = f"""
    WITH sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_duck_dot('q.embedding', 'c.embedding')}
                 / (sqrt({_duck_dot('q.embedding', 'q.embedding')})
                    * sqrt({_duck_dot('c.embedding', 'c.embedding')})) AS sim
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        FROM sims
    ) r WHERE rank <= 5
"""


@register("llm_ann_brute_topk", oracle=_ANN_ORACLE)
def llm_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 query vectors — the ANN
    baseline. Deterministic decimal-sum dot products make the similarity
    values bit-comparable to the oracle."""
    from databend_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    return brute_force_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5
    ).withColumn("rank", F.col("rank").cast("int"))


@register("llm_ann_lsh_topk", oracle=None)  # approximate by construction
def llm_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (hyperplane signatures + multi-probe) — the scale
    path. Recall vs brute force asserted in tests/test_llm_ops.py."""
    from databend_spark.operators.similarity import lsh_ann_topk

    emb = spark.table("embeddings")
    return lsh_ann_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@register(
    "llm_embed_neardup",
    oracle=f"""
    SELECT ia, ib, sim FROM (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               {_duck_dot('a.embedding', 'b.embedding')}
                 / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
                    * sqrt({_duck_dot('b.embedding', 'b.embedding')})) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) t WHERE sim >= 0.4
    """,
)
def llm_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.4). Bit-exact sims
    make the threshold membership identical to the oracle."""
    from databend_spark.operators.similarity import neardup_pairs

    return neardup_pairs(spark.table("embeddings"), threshold=0.4)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "llm_text_quality",
    oracle="""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS INT)                   AS n_chars,
           CAST(len(toks) AS INT)                      AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT)       AS n_uniq_tokens,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)  AS uniq_ratio,
           CAST(length(text) AS DOUBLE) / len(toks)    AS avg_token_len,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / length(text)                          AS alpha_ratio
    FROM t
    """,
)
def llm_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databend_spark.operators.text import quality_features

    return quality_features(spark.table("documents").select("doc_id", "text")).drop(
        "text"
    )


@register(
    "llm_text_langid",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(text), '\\s+') AS toks
        FROM documents
    ), hits AS (
        SELECT doc_id,
            CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','zu'], x))) AS INT) AS hits_de,
            CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS INT)    AS hits_en,
            CAST(len(list_filter(toks, x -> list_contains(['el','la','de','y','en'], x))) AS INT)      AS hits_es,
            CAST(len(list_filter(toks, x -> list_contains(['le','la','de','et','un'], x))) AS INT)     AS hits_fr,
            CAST(len(list_filter(toks, x -> list_contains(['de','le','shi','he','zai'], x))) AS INT)   AS hits_zh
        FROM t
    )
    SELECT doc_id, hits_de, hits_en, hits_es, hits_fr, hits_zh,
           CASE WHEN hits_zh > greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'zh'
                WHEN hits_fr > greatest(hits_de, hits_en, hits_es)          THEN 'fr'
                WHEN hits_es > greatest(hits_de, hits_en)                   THEN 'es'
                WHEN hits_en > hits_de                                      THEN 'en'
                ELSE 'de' END AS lang_guess
    FROM hits
    """,
)
def llm_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databend_spark.operators.text import language_scores

    return language_scores(spark.table("documents").select("doc_id", "text")).drop(
        "text"
    )


@register(
    "llm_text_tokens",
    oracle="""
    SELECT source,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_words,
           CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
                + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))) AS BIGINT)
               AS total_bpeish
    FROM documents GROUP BY source
    """,
)
def llm_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source (whitespace + BPE-ish)."""
    from databend_spark.operators.text import token_counts

    return (
        token_counts(spark.table("documents").select("source", "text"))
        .groupBy("source")
        .agg(
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_bpeish_tokens").cast("bigint").alias("total_bpeish"),
        )
    )


@register(
    "llm_text_fingerprint",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
        FROM documents
    )
    SELECT doc_id,
           md5(norm) AS content_md5,
           list_min(list_transform(string_split(norm, ' '),
                                   x -> substr(md5(x), 1, 8))) AS min_token_hash
    FROM t
    """,
)
def llm_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databend_spark.operators.text import fingerprint

    return fingerprint(spark.table("documents").select("doc_id", "text")).drop("text")


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "llm_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT)          AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(doc_id % 1920 + 1 AS INT)     AS width,
           CAST(doc_id % 1080 + 1 AS INT)     AS height
    FROM documents WHERE doc_id < 100
    """,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: payload+metadata → Arrow-batched
    mapInPandas feature extraction (decode step stubbed deterministically;
    the oracle proves the plumbing delivers exact bytes)."""
    from databend_spark.operators.multimodal import (
        attach_binary_payload,
        decode_features,
    )

    docs = spark.table("documents").filter(F.col("doc_id") < 100)
    return decode_features(attach_binary_payload(docs)).select(
        "doc_id", "n_bytes", "first_byte", "width", "height"
    )


# ---------------------------------------------------------------------------
# Full-text search (reference: MATCH/QUERY/SCORE over tantivy inverted
# indexes — semantic/type_check/search.rs:57; here the index is a
# term-clustered postings DataFrame and BM25 is a codegen'd join+agg)
# ---------------------------------------------------------------------------


@register(
    "fts_bm25_topk",
    oracle=None,  # set below via bm25_oracle_sql (keeps formulas in one place)
)
def fts_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for 'hash join fast' over documents: postings build →
    broadcast term-stats join → per-doc agg → TakeOrderedAndProject."""
    from databend_spark.operators.fulltext import build_inverted_index, search_bm25

    postings, doclens = build_inverted_index(spark.table("documents"), "doc_id", "text")
    return search_bm25(postings, doclens, "hash join fast", k=10)


def _set_fts_oracle() -> None:
    from databend_spark.operators.fulltext import bm25_oracle_sql
    from databend_spark.suite.base import REGISTRY

    REGISTRY["fts_bm25_topk"].oracle = bm25_oracle_sql(
        "documents", "doc_id", "text", "hash join fast", k=10
    )


_set_fts_oracle()


@register(
    "fts_match",
    oracle="""
    WITH toked AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_has_any(toks, ['vector', 'stream']) AS any_m,
           list_has_all(toks, ['hash', 'join', 'window']) AS all_m
    FROM toked
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def fts_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-side MATCH predicate (OR and AND modes) — pure array built-ins,
    no index required (the reference also evaluates MATCH without an index
    by scanning)."""
    from databend_spark.operators.fulltext import match_all, match_any

    return (
        spark.table("documents")
        .filter("doc_id < 200")
        .select(
            "doc_id",
            match_any("text", "vector stream").alias("any_m"),
            match_all("text", "hash join window").alias("all_m"),
        )
        .orderBy("doc_id")
    )


@register("llm_ann_ivf_topk", oracle=None)  # approximate by construction
def llm_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: sampled-centroid coarse quantizer, probe the 4
    nearest of 16 cells, exact re-rank inside (reads nprobe/ncells of
    the corpus — the inverted-list scale path; recall + exactness at
    nprobe=ncells asserted in tests/test_llm_ops.py)."""
    from databend_spark.operators.similarity import ivf_build, ivf_search

    emb = spark.table("embeddings")
    idx = ivf_build(emb, ncells=16)
    return ivf_search(
        emb.filter(F.col("vec_id") < 10), idx, idx.assigned, k=5, nprobe=4
    )

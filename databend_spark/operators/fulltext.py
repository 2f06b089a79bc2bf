"""Full-text search — inverted index + BM25 ranking, Spark-first.

Reference: Databend's inverted indexes are tantivy-backed
(``src/query/storages/common/index/src/inverted_index.rs``, writer
``storages/fuse/src/io/write/inverted_index_writer.rs``) and surface as
``MATCH(col, 'terms')`` / ``QUERY('col:term')`` / ``SCORE()``
(``src/query/sql/src/planner/semantic/type_check/search.rs:57-104``).

Spark design — the index IS a DataFrame:
  * ``build_inverted_index`` explodes documents into (term, doc_id, tf)
    postings plus per-doc lengths. Persisted with ``cluster_write`` on
    ``term``, the posting list of a term is a contiguous parquet range —
    the reader prunes to exactly the query's terms (the same access
    pattern tantivy gets from its FST; here row-group min/max on the
    sorted term column provide it).
  * ``search_bm25`` joins the (tiny) query-term set against the postings
    — a broadcast join on term — then aggregates per doc. No UDFs; the
    whole plan is codegen'd joins + aggs, so it scales to a 100 TB corpus
    exactly like any partial→final aggregation.
  * ``match_any``/``match_all`` are the scan-side MATCH predicate (no
    index needed), a codegen'd array_overlap/array-subset test.

BM25 uses the Lucene/tantivy formula:
  idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
  score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(col) -> Column:
    """Lowercase alphanumeric tokenization (tantivy SimpleTokenizer
    analog); empty strings from leading/trailing separators removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != "")


def match_any(text_col, query: str) -> Column:
    """MATCH(col, 'a b') with OR semantics: any query term present."""
    q = [t for t in _norm(query)]
    return F.arrays_overlap(tokens(text_col), F.array(*[F.lit(t) for t in q]))


def match_all(text_col, query: str) -> Column:
    """MATCH(col, 'a b', 'AND') — every query term present."""
    toks = tokens(text_col)
    cond = F.lit(True)
    for t in _norm(query):
        cond = cond & F.array_contains(toks, t)
    return cond


def _norm(query: str) -> list[str]:
    import re as _re

    seen, out = set(), []
    for t in _re.split(TOKEN_SPLIT, query.lower()):
        if t and t not in seen:
            seen.add(t)
            out.append(t)
    return out


def build_inverted_index(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens): postings = (term, doc_id, tf); doclens =
    (doc_id, dl). Persist postings via ``cluster_write(postings, path,
    ["term"])`` to get per-term parquet locality at scale."""
    # NOTE(r10): dedup._spread on the tokenize stream was A/B'd and is a
    # NET REGRESSION here (interleaved same-session, 6 iters: median
    # 1.35s vs 1.18s, min 1.29 vs 0.74): Catalyst pushes the query's
    # term filter below the postings agg, so every consumer branch pays
    # its own round-robin exchange (no reuse) — four extra shuffle
    # stages to parallelize a ~150 ms tokenize. Matches the two earlier
    # negative results on restructuring this operator (r9/r10 §6).
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    doclens = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    return postings, doclens


def search_bm25(
    postings: DataFrame,
    doclens: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k (doc_id, score) for the query terms, BM25-ranked.

    Plan shape: filter postings to the query's terms (pruned scan),
    broadcast-join per-term df/idf (a handful of rows), join doc lengths,
    single partial→final agg per doc, TakeOrderedAndProject for top-k.
    """
    spark = postings.sparkSession
    terms = [t for t in _norm(query)]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    n_stats = doclens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    matched = postings.filter(F.col("term").isin(terms))
    df_per_term = matched.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        matched.join(F.broadcast(df_per_term), "term")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(n_stats))
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        # rank on the ROUNDED score: float summation order differs across
        # engines by ulps, and doc_id breaks rounded ties identically —
        # so the top-k cut is engine-stable
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def bm25_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """DuckDB SQL computing the identical BM25 top-k (for oracles)."""
    terms = _norm(query)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc_id,
             unnest(string_split_regex(lower({text_col}), '{TOKEN_SPLIT}')) AS term
      FROM {table}
    ), toks_f AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), postings AS (
      SELECT term, doc_id, count(*) AS tf FROM toks_f GROUP BY term, doc_id
    ), doclens AS (
      SELECT doc_id, count(*) AS dl FROM toks_f GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclens
    ), dfs AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM postings
      WHERE term IN ({in_list}) GROUP BY term
    )
    SELECT doc_id, round(sum(
      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
      * (tf * ({k1} + 1.0))
      / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
    ), {round_to}) AS score
    FROM postings JOIN dfs USING (term)
    JOIN doclens USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {k}
    """

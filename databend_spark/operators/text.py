"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting. All JVM-side
built-ins (codegen'd); each is also expressible in ANSI SQL for the
DuckDB oracle (see suite/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword lists; deterministic argmax → language guess
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "de", "et", "un"],
    "es": ["el", "la", "de", "y", "en"],
    "zh": ["de", "le", "shi", "he", "zai"],
}


def _stop_hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword-hit counts + deterministic argmax guess."""
    out = df.withColumn("tokens", F.split(F.lower(F.col(text_col)), r"\s+"))
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"hits_{lang}", _stop_hits(F.col("tokens"), words))
    # argmax with lexicographic tie-break on language code
    guess = F.lit("unknown")
    best = F.lit(-1)
    for lang in sorted(STOPWORDS):
        cond = F.col(f"hits_{lang}") > best
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
        best = F.when(cond, F.col(f"hits_{lang}")).otherwise(best)
    return out.withColumn("lang_guess", guess).drop("tokens")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, uniqueness ratio,
    alpha ratio — the usual pre-training filter signals.

    The token array is evaluated ONCE per row through a packed struct
    (the r8 projection inlined the split 4× — once per stat referencing
    it — because Catalyst re-evaluates a projected alias per use); the
    stats are unpacked in a second projection that CollapseProject keeps
    separate (non-cheap producer, multiple references)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    packed = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.struct(
                F.size(t).alias("n_tokens"),
                F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
            ),
        ),
        1,
    )
    with_stats = df.select("*", packed.alias("_q"))
    return with_stats.select(
        *df.columns,
        F.length(text_col).alias("n_chars"),
        F.col("_q.n_tokens").alias("n_tokens"),
        F.col("_q.n_uniq_tokens").alias("n_uniq_tokens"),
        (
            F.col("_q.n_uniq_tokens").cast("double") / F.col("_q.n_tokens")
        ).alias("uniq_ratio"),
        (F.length(text_col).cast("double") / F.col("_q.n_tokens")).alias(
            "avg_token_len"
        ),
        (
            F.length(F.regexp_replace(text_col, r"[^a-zA-Z]", "")).cast("double")
            / F.length(text_col)
        ).alias("alpha_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    segmentation (alnum runs + single non-space symbols) — the cheap
    proxy for tokenizer cost accounting."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    # BPE-ish proxy: alnum runs + each standalone symbol char counts as a
    # token (portable regex — no lookarounds, RE2-compatible for oracles)
    alnum_runs = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-zA-Z0-9]+"), F.lit(0)))
    symbols = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9\\s]", ""))
    return df.select(
        "*",
        ws.alias("n_words"),
        (alnum_runs + symbols).alias("n_bpeish_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5 + a winnowing-style
    min-hash of token md5 prefixes (stable under token reorder).

    The normalization regex runs once per row (two-projection split —
    the single-projection form evaluated it once for the md5 and again
    for the token split)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    normed = df.select("*", norm.alias("_norm"))
    return normed.select(
        *df.columns,
        F.md5(F.col("_norm")).alias("content_md5"),
        F.array_min(
            F.transform(
                F.split(F.col("_norm"), " "),
                lambda t: F.substring(F.md5(t), 1, 8),
            )
        ).alias("min_token_hash"),
    )

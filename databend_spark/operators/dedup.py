"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash — each built
from JVM-side built-ins (no Python row UDFs in the hot path).

Scale design (100 TB):
  * exact dedup = one shuffle on the hash of the dedup key; we group on
    ``xxhash64(text)`` rather than the full text so shuffle rows carry
    8 bytes instead of document bodies.
  * shingle self-join shuffles on the shingle hash; a document-frequency
    cap (``max_shingle_df``) drops stop-shingles that would otherwise
    create quadratic hot keys (standard trick; keep None for exact
    semantics on small data).
  * MinHash-LSH replaces the all-pairs O(n²) join with per-band bucket
    joins: candidates only where a band collides. Bands are the shuffle
    key → uniform unless the corpus is pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens_expr(text_col: str):
    """Whitespace-token array; engine-standard normalization (lower, squeeze)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )


def _bind(expr, fn):
    """Let-binding for an expensive expression used inside per-element
    lambdas. Catalyst's CollapseProject inlines a projected alias into
    every reference — so ``transform(idx, i -> f(tokens[i]))`` with
    ``tokens = split(regexp_replace(...))`` re-runs the regex+split for
    EVERY lambda element (measured 15x slowdown on shingling). Wrapping
    the expression in a single-element array and binding it as the outer
    transform's lambda variable forces exactly one evaluation per row;
    ``fn`` must return an array (flatten unwraps the singleton)."""
    return F.flatten(F.transform(F.array(expr), fn))


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when it arrives in fewer
    file splits than cores (e.g. one small parquet file = one scan task):
    shingling is CPU-bound, so a single-task scan serializes the whole
    tokenize+shingle pipeline. No-op (returns df unchanged) when the
    input already has enough splits — at warehouse scale inputs arrive
    in thousands of file splits and must NOT be re-shuffled.

    The probe is ``inputFiles()`` (driver-side scan metadata), NOT
    ``df.rdd.getNumPartitions()`` — the RDD probe forces a full
    plan-to-RDD conversion on every call (cost grows with plan size and
    defeats analyzed-plan reuse). Non-file sources (no input files)
    keep their upstream partitioning untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file-backed plan
        nfiles = 0
    if 0 < nfiles < target:
        return df.repartition(target)
    return df


def _footer_row_count(df: DataFrame, max_exact_files: int = 256) -> int | None:
    """Driver-side row count of a file-backed DataFrame from parquet
    footers — no Spark job. Returns None when the plan isn't backed by
    local parquet files (caller falls back to ``df.count()``).

    Counts the base files, so it's an upper bound if ``df`` carries
    filters — acceptable for heuristics like the stop-shingle DF cap.
    Beyond ``max_exact_files`` files, samples footers and extrapolates
    by byte size so the driver never reads tens of thousands of footers."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001
        return None
    if not files:
        return None
    import os as _os
    from urllib.parse import urlparse

    paths = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None  # remote FS: let Spark count with its own readers
        paths.append(u.path or f)
    try:
        import pyarrow.parquet as _pq

        if len(paths) <= max_exact_files:
            return sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)
        sample = paths[:: max(1, len(paths) // max_exact_files)][:max_exact_files]
        srows = sum(_pq.ParquetFile(p).metadata.num_rows for p in sample)
        sbytes = sum(_os.path.getsize(p) for p in sample)
        tbytes = sum(_os.path.getsize(p) for p in paths)
        return int(srows * tbytes / sbytes) if sbytes else None
    except Exception:  # noqa: BLE001 — not parquet / unreadable
        return None


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens; engine-standard normalization (lower, squeeze)."""
    return df.withColumn("tokens", _tokens_expr(text_col))


def shingle_expr(text_col: str, n: int = 3):
    """Distinct word n-gram shingle array as a single Column.

    Per-gram build is unrolled ``concat(t[i], ' ', t[i+1], ...)`` —
    measured ~6x faster than ``concat_ws(' ', slice(t, i+1, n))`` — and
    the token array is let-bound (see ``_bind``) so normalization runs
    once per row, not once per gram."""

    def build(t):
        gram = lambda i: F.concat(  # noqa: E731
            *[
                part
                for k in range(1, n + 1)
                for part in (F.element_at(t, i + k), F.lit(" "))
            ][:-1]
        )
        return F.when(
            F.size(t) >= n,
            F.array_distinct(
                F.transform(F.sequence(F.lit(0), F.size(t) - n), gram)
            ),
        ).otherwise(F.array(F.concat_ws(" ", t)))

    return _bind(_tokens_expr(text_col), build)


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (column ``shingles``)."""
    return df.withColumn("shingles", shingle_expr(text_col, n))


def hashed_shingle_expr(text_col: str, n: int = 3):
    """xxhash64'd distinct n-gram shingles (array<long>).

    Hashing INSIDE the array (one transform over shingle_expr) means
    everything downstream — explode, minhash sweeps, set intersects —
    operates on 8-byte longs instead of multi-word strings: the explode
    emits slim rows directly (the r8 plan exploded strings and hashed
    per exploded row), and per-seed minhash hashes a long, not a
    re-scanned string. Collision odds 2⁻⁶⁴ per pair — negligible."""
    return F.transform(shingle_expr(text_col, n), lambda s: F.xxhash64(s))


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """Exact duplicate groups: one row per duplicated key with the keeper
    (min id) and the duplicate count. Groups on xxhash64 of the key so
    the shuffle carries hashes, not payloads (collision-checked by also
    carrying the key when small)."""
    key = F.xxhash64(*key_cols)
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None | str = "auto",
) -> DataFrame:
    """All document pairs with n-gram-shingle Jaccard ≥ threshold.

    Plan shape: explode distinct hashed shingles → stop-shingle cap
    (default on) → slim self-equi-join on the shingle (both sides the
    SAME subplan — one shared exchange) → pair-count = |A∩B| → join
    per-doc set sizes (AQE broadcasts the sizes side when it is
    genuinely small) → Jaccard filter.

    ``max_shingle_df`` guards the self-join against quadratic hot keys: a
    shingle present in d documents emits d² join rows, so one stop-shingle
    ("in the the") in 10⁷ docs is a 10¹⁴-row key. The default ``"auto"``
    caps document frequency at max(1000, 20·√n_docs) — scale-proportional
    but sub-linear, so worst-case per-key fanout grows like n, not n².
    Dropping a hot shingle can only lower a pair's computed Jaccard
    ((i-k)/(u-k) < i/u for i<u), so the capped output is a subset of the
    exact one and true near-dups (which share many specific shingles) are
    unaffected; identity on corpora whose max DF is under the cap is
    exercised in tests. Pass ``None`` for exact semantics regardless of
    cost, or an int to pin the cap.
    """
    # ONE projection from documents to the slim (doc, sh) stream: the
    # shingles are hashed inside the array (hashed_shingle_expr) so the
    # explode emits 8-byte longs directly — and one DataFrame op instead
    # of the r8 three (each op re-runs the analyzer over the accumulated
    # tree; construction cost was ~30% of this query at bench scale)
    ex = _spread(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        F.explode(hashed_shingle_expr(text_col, n)).alias("sh"),
    )
    if max_shingle_df == "auto":
        # footer metadata first (no Spark job — the r7 count() job cost
        # ~0.3s of fixed overhead per call); count() only for non-file
        # sources
        n_docs = _footer_row_count(df)
        if n_docs is None:
            n_docs = df.count()
        max_shingle_df = max(1000, int(20 * n_docs**0.5))
    # the exploded shingle stream feeds the stop-shingle tally, both join
    # sides AND the set sizes — lazily localCheckpoint it so
    # tokenize+shingle runs once (first job materializes the blocks, the
    # other branches read them).  Unlike persist(), a local checkpoint
    # never enters the SQL CacheManager, so there is nothing to unpersist:
    # the context cleaner frees the blocks when the returned DataFrame is
    # garbage-collected — repeated calls cannot leak executor storage, and
    # the result is not double-materialized through an eager checkpoint.
    ex = ex.localCheckpoint(eager=False)
    # Sizes come from the capped stream, so Jaccard is computed over the
    # capped shingle universe: stop-shingles leave both |A∩B| and |A∪B| —
    # true near-dup pairs keep their high Jaccard instead of being dragged
    # under the threshold by a dropped shared stop-shingle.
    return _ngram_pair_plan(ex, threshold, max_shingle_df)


def _ngram_pair_plan(
    ex: DataFrame,
    threshold: float,
    max_df: int | None = None,
) -> DataFrame:
    """Pair plan over the exploded (doc, sh) shingle stream (factored out
    so plan tests can pin its shape pre-checkpoint).

    Shape: the stop-shingle DF cap is a hot-key ANTI-JOIN — a partial
    (map-side) count per shingle feeds a tiny over-the-cap relation that
    AQE broadcasts, and the stream drops matching rows with no ordering
    anywhere (the r9 shape computed the cap as a count-only Window,
    forcing a SORT of the entire exploded stream once per consumer
    branch). Pair generation is a slim SELF-EQUI-JOIN on the shingle
    with ``a.doc < b.doc`` — both sides are the IDENTICAL capped subplan
    (``.alias()``, renames only in the output projection) so the planner
    shares ONE exchange/broadcast build between them, and the matches
    stream straight into the partial (da, db) count.

    The r9/r10-interim shape instead collect_list'd the per-shingle doc
    list and exploded block-chunked pair structs from it. Measured
    ~1.6× slower here (same-session interleaved A/B at sf0.1: median
    2.05s vs 1.30s, min 1.75 vs 1.19, identical 256-pair output): the
    non-codegen ObjectHashAggregate plus the nested pair-expression
    tree cost more than the hash-join build/probe they avoided — the
    same result the minhash band join measured (OPTIMIZATION_r10.md).
    It is also the better shape at corpus scale: the join streams
    build×probe matches with per-partition bounded state (SHJ under the
    64 MB local-map threshold, SMJ beyond), whereas collect_list
    materializes a d-element array per shingle in ONE aggregation
    buffer. Per-key fanout stays d ≤ max_df either way (the cap bounds
    total pair COUNT), and AQE's skew-join splits residual hot keys."""
    if max_df is not None:
        # shingles with document frequency over the cap: partial counts
        # compress the hot keys map-side, so the tally exchange carries
        # ~distinct-shingle rows, and the surviving relation is tiny (or
        # empty) — no driver-side collect, no broadcast hint (AQE
        # broadcasts it at runtime from its REAL size)
        hot = (
            ex.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
        )
        ex = ex.join(hot, "sh", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("da"), F.col("b.doc").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = ex.groupBy("doc").agg(F.count("*").alias("n_sh"))
    # plain shuffle joins for the per-doc sizes: an explicit broadcast
    # of an O(n_docs) relation is a driver OOM at corpus scale — AQE
    # converts to broadcast at runtime only when the sizes side is
    # genuinely small. Both joins build the SAME sizes subplan (renaming
    # in the join condition, not a per-side projection) so the planner
    # shares one exchange/broadcast build between them.
    s1, s2 = sizes.alias("s1"), sizes.alias("s2")
    return (
        inter.join(s1, F.col("da") == F.col("s1.doc"))
        .join(s2, F.col("db") == F.col("s2.doc"))
        .select(
            "da",
            "db",
            "inter",
            (
                F.col("inter").cast("double")
                / (F.col("s1.n_sh") + F.col("s2.n_sh") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig[s] = min over hashed shingles
    of xxhash64(s, h). Pure built-ins (nested higher-order functions) —
    no UDF.

    The ``shingles`` column is the HASHED shingle set (array<long>, see
    ``hashed_shingle_expr``): per-seed sweeps hash an 8-byte long
    instead of re-scanning a multi-word string (num_hashes× cheaper
    bytes), and the LSH verify step intersects long sets. Both columns
    come out of ONE packed struct bound to a single shingle evaluation —
    the r8 projection listed ``shingle_expr`` twice (once for shingles,
    once inside sig), tokenizing+shingling every document twice per
    materialization.

    .. note:: format change in r9 — ``shingles`` was array<string> (raw
       n-grams) through r8 and signature values were
       ``xxhash64(seed, shingle_string)``; both changed when shingles
       became pre-hashed longs. Signatures persisted by an r8 build (or
       any external consumer of the raw strings) are NOT comparable to
       r9+ output; recompute rather than mixing versions."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    packed = F.element_at(
        F.transform(
            F.array(hashed_shingle_expr(text_col, shingle_n)),
            lambda sh: F.struct(
                sh.alias("shingles"),
                F.transform(
                    seeds,
                    lambda s: F.array_min(
                        F.transform(sh, lambda h: F.xxhash64(s, h))
                    ),
                ).alias("sig"),
            ),
        ),
        1,
    )
    return (
        _spread(df.select(id_col, text_col))
        .select(F.col(id_col).alias("doc"), packed.alias("_p"))
        .select("doc", "_p.shingles", "_p.sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    rows = bands; r = num_hashes // bands rows per band. Candidate pairs
    collide on (band_id, hash(band slice)); with ``verify_threshold``
    candidates are verified against exact shingle Jaccard (removes LSH
    false positives; output is then deterministic).
    """
    r = num_hashes // bands
    # both the band join (twice) and the verify back-join read this —
    # lazily localCheckpoint so tokenize+shingle+minhash computes once.
    # No CacheManager entry, nothing to unpersist: the context cleaner
    # frees the blocks when the result is garbage-collected, and the
    # result itself is not double-materialized (see ngram_jaccard_pairs).
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n
    ).localCheckpoint(eager=False)
    return _minhash_lsh_pairs_inner(sigs, bands, r, verify_threshold)


def _minhash_lsh_pairs_inner(
    sigs: DataFrame, bands: int, r: int, verify_threshold: float | None
) -> DataFrame:
    # the band join carries ONLY (band, bh, doc): at corpus scale the
    # LSH join's shuffle weight must not be dominated by the documents'
    # shingle arrays (r3 shipped sha/shb through the join, pre-dedup);
    # shingle sets re-join by doc id AFTER pair dedup. Both join sides
    # are the SAME subplan (self-join via alias, doc renamed only in the
    # post-join projection) so the physical plan shares ONE exchange of
    # the banded stream via ReusedExchange — the r9 shape renamed doc
    # before the join, making the sides differ and exchanging the stream
    # twice. (A groupBy+collect_list+pair-explosion variant was measured
    # 70% slower here — the non-codegen ObjectHashAggregate plus the
    # block-pair expression tree cost more than the hash join machinery
    # it saved; see OPTIMIZATION_r10.md.)
    banded = sigs.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.slice("sig", b * r + 1, r)).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("da"), F.col("b.doc").alias("db"))
        .dropDuplicates(["da", "db"])
    )
    if verify_threshold is None:
        return cand
    # both verify joins build the SAME sets subplan — renaming happens in
    # the join condition, not in a per-side projection, so the planner
    # reuses one exchange/broadcast build for both sides instead of
    # building (doc→da) and (doc→db) copies
    sets = sigs.select("doc", "shingles")
    s1, s2 = sets.alias("s1"), sets.alias("s2")
    cand = (
        cand.join(s1, F.col("da") == F.col("s1.doc"))
        .join(s2, F.col("db") == F.col("s2.doc"))
        .select(
            "da",
            "db",
            F.col("s1.shingles").alias("sha"),
            F.col("s2.shingles").alias("shb"),
        )
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    return (
        cand.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= verify_threshold)
        .select("da", "db", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """63-bit SimHash per document from token xxhash64s (63 bits keeps
    the packed signature positive in a signed long).

    Bit i of the signature = majority vote of token-hash bit i. The
    votes are integer sums, so the whole signature is computable IN-ROW
    (one projection, zero shuffles): fold the 63 bit positions, and for
    each fold the doc's token hashes. The r8 plan exploded the token
    stream 63× and ran two shuffle aggregations — at corpus scale that
    is 63× the exploded rows through an exchange for a value each doc
    can compute from its own row. Bit-identical output: the tally is an
    order-independent integer sum, 2^i is exact in double for i ≤ 62,
    and docs with NULL text stay absent (explicit filter — the old
    explode dropped them implicitly)."""
    hashed = F.transform(_tokens_expr(text_col), lambda t: F.xxhash64(t))
    mask = lambda i: F.pow(F.lit(2.0), i).cast("long")  # noqa: E731

    def pack(hs):
        tally = lambda i: F.aggregate(  # noqa: E731
            hs,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask(i)) != 0, 1).otherwise(-1),
        )
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(62)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(tally(i) > 0, mask(i)).otherwise(F.lit(0).cast("long")),
        )

    # the token-hash array is let-bound (one tokenize+hash per row, not
    # one per bit position)
    sig = F.element_at(_bind(hashed, lambda hs: F.array(pack(hs))), 1)
    return (
        _spread(df.select(id_col, text_col))
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc"), sig.alias("simhash"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidates with Hamming(simhash) ≤ max_hamming.

    Pigeonhole bucketing: split the 63 bits into 4 chunks of 16; any pair
    at distance ≤3 agrees on ≥1 chunk → join per chunk, then exact
    Hamming filter via bit_count(xor). Avoids the O(n²) comparison."""
    sig = simhash_signatures(df, id_col, text_col)
    chunked = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc", "simhash", "cc.chunk", "cc.ck")
    a = chunked.select(
        F.col("doc").alias("da"), F.col("simhash").alias("ha"), "chunk", "ck"
    )
    b = chunked.select(
        F.col("doc").alias("db"), F.col("simhash").alias("hb"), "chunk", "ck"
    )
    return (
        a.join(b, ["chunk", "ck"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .dropDuplicates(["da", "db"])
        .filter(F.col("hamming") <= max_hamming)
    )

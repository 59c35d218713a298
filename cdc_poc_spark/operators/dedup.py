"""Deduplication operators over ``documents`` — exact and near-dup, the
core of any large-scale training-data pipeline (SURVEY §7.3 M6).

Design for 100 TB:
- exact: hash-groupBy on md5(text) — one shuffle on a 60-bit key, map-side
  combine; never shuffles the text itself (only hash + id travel).
- n-gram Jaccard: shingle explode -> self-join on shingle -> per-pair
  intersection counts. The shingle join is the scale path LSH also uses;
  candidate generation never materializes the O(n^2) pair space, only pairs
  that actually share a shingle.
- MinHash-LSH: signature = H seeded min-hashes per doc (one pass over
  shingles, no shuffle), banding -> bucket join on (band, bucket-key) ->
  exact Jaccard verify on candidates only. Band count/width trade recall
  vs cost exactly as in the MinHash literature.
- SimHash: 60-bit fingerprint via per-bit weighted majority of token
  hashes; near-dups = fingerprints at small Hamming distance, found by
  exact-match blocking on bit-chunks (here: full-equality + distance
  verify over shared-chunk candidates).

Everything is hash + explode + join + groupBy — no Python in the data path;
the portable md5-based hash family keeps the DuckDB oracle bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_seeded, minhash_constants
from ..functions.partitioning import hash_distinct, spread
from .text_analysis import tokens

# MinHash-LSH defaults: 12 hashes in 4 bands of 3 — generous recall at the
# driver corpus' similarity levels; tune bands/rows for the target threshold.
MINHASH_HASHES = 12
MINHASH_BANDS = 4
SHINGLE_K = 3

SIMHASH_BITS = 16

# Document-frequency cap for the shingle self-join: a shingle present in
# more than this fraction of the corpus is a "stop-shingle" (boilerplate,
# license headers, templated phrases). Without the cap, pairs-sharing-a-
# shingle is quadratic in that shingle's document frequency — ONE shingle
# in 1% of a 10B-doc corpus is 10^16 candidate pairs. The cap is part of
# the operator's CONTRACT (the DuckDB oracle applies it identically):
# Jaccard is computed over the df-filtered shingle sets.
MAX_SHINGLE_DF_FRAC = 0.5


def exact_dups(docs: DataFrame) -> DataFrame:
    """Exact dedup via content hash: per distinct text, the keeper (min
    doc_id) and the duplicate count."""
    h = md5_long(F.col("text"))
    return (
        docs.groupBy(h.alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles (word n-grams). Empty when < k tokens."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Spread the corpus across cores before CPU-heavy per-row expressions
    (no-op on a properly-split cluster scan — see functions.partitioning)."""
    return spread(docs, "doc_id")


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle-hash) exploded — the candidate-generation substrate.

    The shingle travels as its 60-bit md5 hash, not the string: the
    self-join below shuffles ~3x less and compares longs, and set
    cardinalities (sizes / intersections) are unchanged up to md5
    collisions (~2^-61 per pair — negligible against any corpus)."""
    return _spread(docs).select(
        "doc_id",
        F.explode(F.transform(shingles(F.col("text"), k), md5_long)).alias("shingle"),
    )


def _filtered_shingle_arrays(
    docs: DataFrame,
    k: int,
    max_df_frac: float | None,
    cache: bool,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, shs, n): per-doc df-filtered shingle-hash arrays in global
    rarest-first (df, shingle) order — the shared substrate of the
    prefix-filtered similarity self-joins (Jaccard and containment).

    Document frequency is attached with a window count over ``shingle``
    rather than a groupBy+re-join: the exploded index is shuffled ONCE
    (the window exchange) instead of twice plus a distinct-shingle join
    side, and the expensive explode+md5 pass runs once in the same
    lineage — so the raw index no longer needs its own persist. The
    window's per-partition sort is over narrow (shingle, doc_id) rows,
    a cheap price for a whole saved pass (~25% at sf0.1; fewer shuffles
    at any scale). The df cap still drops hot shingles before the
    per-doc collect. ``shingles`` lets a composition (the curation
    funnel) pass a pre-computed (persisted) doc_shingles frame so the
    corpus is shingle-hashed once across several consumers."""
    sh = doc_shingles(docs, k) if shingles is None else shingles
    win = Window.partitionBy("shingle")
    shd = sh.withColumn("_df", F.count(F.lit(1)).over(win))
    if max_df_frac is not None:
        tot = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
        shd = (
            shd.crossJoin(F.broadcast(tot))
            .filter(F.col("_df") <= F.col("_n_docs") * F.lit(float(max_df_frac)))
            .select("doc_id", "shingle", "_df")
        )
    arrs = (
        shd.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_df").alias("df"), F.col("shingle").alias("sh"))
                )
            ).alias("srt")
        )
        .select(
            "doc_id",
            F.transform("srt", lambda s: s["sh"]).alias("shs"),
            F.size("srt").alias("n"),
        )
    )
    if cache:
        arrs = arrs.persist()
    return arrs


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    k: int = SHINGLE_K,
    cache: bool = True,
    max_df_frac: float | None = MAX_SHINGLE_DF_FRAC,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold, where the
    shingle sets exclude stop-shingles (document frequency > ``max_df_frac``
    of the corpus — see MAX_SHINGLE_DF_FRAC; None disables the cap).

    Candidate generation is PREFIX-FILTERED (AllPairs/PPJoin, Bayardo et
    al. 2007; Xiao et al. 2008): per doc, shingles are globally ordered
    rarest-first by (document frequency, shingle), and only the first
    ``n - ceil(t*n) + 1`` entries are exploded into the candidate
    self-join. The filter is LOSSLESS for a Jaccard-threshold join: if
    J(A,B) >= t, the smallest element of A ∩ B in the global order must sit
    inside both prefixes (removing a prefix leaves < t*n elements, fewer
    than the required overlap), so every qualifying pair still collides —
    while the naive join's sum-over-shingles df^2 candidate blowup
    collapses to rare-shingle collisions only (measured 1.1M -> ~20k
    candidate pairs at sf0.1, t=0.8). Verification reads the per-doc
    filtered shingle arrays once (`array_intersect`), candidate-sized work.

    The df cap is the worst-case guard: without it, one shingle shared by
    m documents contributes m^2/2 join rows even post-prefix. The cap
    rides the same df aggregate the prefix ordering already needs — an
    inner join on df-filtered shingles, no extra pass.
    """
    t = float(threshold)
    arrs = _filtered_shingle_arrays(docs, k, max_df_frac, cache, shingles)
    plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
    pref = arrs.select(
        "doc_id", F.explode(F.slice("shs", 1, plen)).alias("shingle")
    )
    cand = hash_distinct(
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")),
        "doc_a",
        "doc_b",
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n").alias("n_a"),
    )
    bb = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n").alias("n_b"),
    )
    n_common = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            (
                n_common.cast("double")
                / (F.col("n_a") + F.col("n_b") - n_common)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


CONTAINMENT_THRESHOLD = 0.9


def containment_pairs(
    docs: DataFrame,
    threshold: float = CONTAINMENT_THRESHOLD,
    k: int = SHINGLE_K,
    cache: bool = True,
    max_df_frac: float | None = MAX_SHINGLE_DF_FRAC,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Doc pairs where either containment direction clears ``threshold`` —
    containment(A in B) = |A ∩ B| / |A| over the df-filtered shingle sets
    (Broder 1997 distinguishes *containment* from *resemblance*/Jaccard):
    a short document quoted whole inside a long one has containment ~1 but
    Jaccard ~ |A|/|B|, so a Jaccard-threshold dedup silently keeps the
    quote-pair. This is the subset-dup complement of ngram_jaccard_pairs.

    Candidate generation stays prefix-filtered and lossless: if
    max(c_a, c_b) >= t then the higher-containment doc X has
    |X ∩ Y| >= ceil(t*|X|), which cannot fit entirely in X's suffix of
    length ceil(t*|X|) - 1 — so X's rarest-first prefix of length
    n - ceil(t*n) + 1 intersects Y's FULL set, and the prefix ⋈ full-index
    equi-join finds the pair. Verification reads the per-doc arrays once.

    Output: (doc_a < doc_b, n_common, containment_a, containment_b),
    filtered on the max direction."""
    t = float(threshold)
    arrs = _filtered_shingle_arrays(docs, k, max_df_frac, cache, shingles)
    plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
    pref = arrs.select(
        "doc_id", F.explode(F.slice("shs", 1, plen)).alias("shingle")
    )
    full = arrs.select(
        F.col("doc_id").alias("doc_f"), F.explode("shs").alias("shingle")
    )
    cand = hash_distinct(
        pref.join(full, "shingle")
        .filter(F.col("doc_id") != F.col("doc_f"))
        .select(
            F.least("doc_id", "doc_f").alias("doc_a"),
            F.greatest("doc_id", "doc_f").alias("doc_b"),
        ),
        "doc_a",
        "doc_b",
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n").alias("n_a"),
    )
    bb = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n").alias("n_b"),
    )
    n_common = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            (n_common.cast("double") / F.col("n_a")).alias("containment_a"),
            (n_common.cast("double") / F.col("n_b")).alias("containment_b"),
        )
        .filter(F.greatest("containment_a", "containment_b") >= t)
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = MINHASH_HASHES, k: int = SHINGLE_K
) -> DataFrame:
    """Per doc, the MinHash signature as `sig_0..sig_{H-1}` columns.

    Each shingle is md5-hashed ONCE (projected to an intermediate hash
    array), then the H signature values are mins over XOR-mixed copies —
    H× fewer digest computations than the seeded-md5-per-function naive
    form, same portability."""
    consts = minhash_constants(num_hashes)
    hashed = _spread(docs).select(
        "doc_id",
        F.transform(shingles(F.col("text"), k), md5_long).alias("_h"),
    )
    cols = [
        F.array_min(
            F.transform(F.col("_h"), lambda h: h.bitwiseXOR(F.lit(consts[i])))
        ).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return hashed.select("doc_id", *cols)


def _banded(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, bucket_key) — one row per band, via a single explode
    so the signature columns are evaluated ONCE per document (a per-band
    union would recompute the whole signature array in every branch)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"sig_{b * rows + r}") for r in range(rows)]
                ).alias("bucket_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("doc_id", F.explode(entries).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bucket_key").alias("bucket_key")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
    k: int = SHINGLE_K,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of >= 1 band. Output: distinct
    (doc_a, doc_b) candidate pairs, doc_a < doc_b."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, k)
    all_buckets = _banded(sigs, bands, rows)
    a, b_ = all_buckets.alias("a"), all_buckets.alias("b")
    pairs = a.join(
        b_,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket_key") == F.col("b.bucket_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    return hash_distinct(pairs, "doc_a", "doc_b")


def minhash_base(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """The persisted (doc_id, sh, hs) shingle/hash substrate of
    :func:`minhash_lsh_dups` — exposed (round 10) so compositions that
    ALSO need the exploded shingle-hash index (the LSH-recall measure
    runs the exact Jaccard truth join next to the LSH path) can hash the
    corpus once: ``explode(hs)`` is expression-identical to
    :func:`doc_shingles`."""
    return (
        _spread(docs)
        .select("doc_id", shingles(F.col("text"), k).alias("sh"))
        .withColumn("hs", F.transform(F.col("sh"), md5_long))
        .persist()
    )


def minhash_lsh_dups(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
    k: int = SHINGLE_K,
    base: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup: LSH candidates verified with exact
    shingle Jaccard >= threshold.

    The verify step touches ONLY candidate pairs (join candidates back to
    the per-doc shingle array, `array_intersect` for |A ∩ B|) — this is the
    whole point of LSH: cost is O(candidates), never the O(pairs sharing a
    shingle) of the full self-join. The shingle/hash arrays are computed
    once and persisted; signatures, banding keys, and verification all read
    that one pass. ``base`` lets a composition pass a pre-built
    :func:`minhash_base` shared with other consumers."""
    rows = num_hashes // bands
    consts = minhash_constants(num_hashes)
    if base is None:
        base = minhash_base(docs, k)
    sig_cols = [
        F.array_min(
            F.transform(F.col("hs"), lambda h: h.bitwiseXOR(F.lit(consts[i])))
        ).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    # empty shingle sets can never reach a positive Jaccard threshold; drop
    # them before banding (otherwise they'd all share the null-sig bucket)
    sigs = base.filter(F.size("sh") > 0).select("doc_id", *sig_cols)
    all_buckets = _banded(sigs, bands, rows)
    a, b_ = all_buckets.alias("a"), all_buckets.alias("b")
    cands = hash_distinct(
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket_key") == F.col("b.bucket_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")),
        "doc_a",
        "doc_b",
    )
    sa = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union_size = F.size("sh_a") + F.size("sh_b") - n_common
    # SHUFFLE_HASH from the candidate side: the planner's static size
    # estimate for sa/sb comes from compressed parquet bytes, but the
    # materialized shingle arrays are ~10-50x that — at the 100x probe
    # (500k docs) the estimate-driven BroadcastHashJoin of sa/sb blew
    # past driver memory (round 9). Building the per-partition hash from
    # the candidate-pair side (two longs per row) and streaming the
    # array side is the shape that survives at any corpus size.
    return (
        cands.hint("shuffle_hash")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            (n_common.cast("double") / union_size).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_minhash_dups(
    index_docs: DataFrame,
    batch_docs: DataFrame,
    threshold: float,
    num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Incremental near-dup: match an INCOMING BATCH against an already-
    indexed corpus without re-pairing the corpus with itself.

    This is how dedup actually runs in a continuously-ingesting pipeline:
    the corpus' banding keys are a standing index (at 100 TB, a bucketed
    table keyed by (band, bucket_key)); each new batch computes its own
    signatures, probes the index — a join whose left side is only the
    batch — and verifies candidates with exact shingle Jaccard. Cost per
    batch is O(batch + candidates), never O(corpus^2), and corpus-internal
    pairs are deliberately NOT re-emitted.

    Output: (doc_batch, doc_index, n_common, jaccard) pairs over threshold.
    """
    rows = num_hashes // bands
    consts = minhash_constants(num_hashes)

    def _prep(docs: DataFrame) -> DataFrame:
        return (
            _spread(docs)
            .select("doc_id", shingles(F.col("text"), k).alias("sh"))
            .withColumn("hs", F.transform(F.col("sh"), md5_long))
            .persist()
        )

    # NB: a two-parameter lambda would be treated by F.transform as
    # (element, index) — bind the constant via a closure factory instead
    def _xor_const(c: int):
        return lambda h: h.bitwiseXOR(F.lit(c))

    def _buckets(base: DataFrame) -> DataFrame:
        sig_cols = [
            F.array_min(F.transform(F.col("hs"), _xor_const(consts[i]))).alias(
                f"sig_{i}"
            )
            for i in range(num_hashes)
        ]
        return _banded(base.filter(F.size("sh") > 0).select("doc_id", *sig_cols), bands, rows)

    idx, bat = _prep(index_docs), _prep(batch_docs)
    cands = hash_distinct(
        _buckets(bat)
        .alias("b")
        .join(
            _buckets(idx).alias("a"),
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.bucket_key") == F.col("a.bucket_key")),
        )
        .select(
            F.col("b.doc_id").alias("doc_batch"), F.col("a.doc_id").alias("doc_index")
        ),
        "doc_batch",
        "doc_index",
    )
    sb = bat.select(F.col("doc_id").alias("doc_batch"), F.col("sh").alias("sh_b"))
    sa = idx.select(F.col("doc_id").alias("doc_index"), F.col("sh").alias("sh_a"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union_size = F.size("sh_a") + F.size("sh_b") - n_common
    # candidate-side SHUFFLE_HASH for the same reason as minhash_lsh_dups:
    # never let a compressed-bytes estimate broadcast the shingle arrays
    return (
        cands.hint("shuffle_hash")
        .join(sb, "doc_batch")
        .join(sa, "doc_index")
        .select(
            "doc_batch",
            "doc_index",
            n_common.alias("n_common"),
            (n_common.cast("double") / union_size).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash fingerprint: bit j of the fingerprint is the majority
    vote of bit j across the (distinct) token hashes.

    The token-hash array MUST materialize behind an exchange before the
    per-bit majority votes read it: in one projection CollapseProject
    inlines the tokenize+md5 expression into every bit's filter — the
    whole hash array re-computed ``bits`` times per document (the
    winnow_fingerprints trap; measured on the 60-bit mm_image_dedup_sql
    consumer: 3.4s -> 2.3s end-to-end at sf0.1, min-of-4). Behind the
    barrier each vote is a cheap scan of the in-memory array."""
    hashed = _spread(docs).select(
        "doc_id",
        F.transform(
            F.array_distinct(tokens(F.col("text"))), lambda t: md5_long(t)
        ).alias("_hs"),
    )
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    hashed = hashed.repartition(parallelism, "doc_id")
    hashes = F.col("_hs")
    n = F.size(hashes)
    bit_cols = []
    for j in range(bits):
        ones = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << j)) != 0)
        )
        bit_cols.append(F.when(ones * 2 > n, F.lit(1 << j)).otherwise(F.lit(0)))
    fp = bit_cols[0]
    for c in bit_cols[1:]:
        fp = fp + c
    return hashed.select("doc_id", fp.cast("long").alias("simhash"))


# Benchmark decontamination: a doc sharing this many distinct k-gram
# shingles with any held-out/benchmark document is flagged (the standard
# n-gram-overlap eval-contamination check for pretraining corpora)
CONTAM_MIN_SHARED = 5
CONTAM_BENCH_MOD = 50  # deterministic stand-in benchmark: ~2% of the corpus


def benchmark_split(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic (corpus, benchmark) split by doc_id hash — the test
    stand-in for a real eval set. Pure expression, no shuffle."""
    is_bench = md5_long_seeded(F.col("doc_id"), "bench") % CONTAM_BENCH_MOD == 0
    return docs.filter(~is_bench), docs.filter(is_bench)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_shared: int = CONTAM_MIN_SHARED,
    k: int = SHINGLE_K,
    corpus_shingles: DataFrame | None = None,
    bench_shingles: DataFrame | None = None,
) -> DataFrame:
    """Corpus documents contaminated by benchmark overlap: sharing >=
    ``min_shared`` distinct k-gram shingles with the benchmark set, with
    the shared-gram count.

    Scale shape: the benchmark's distinct gram set is small (eval suites
    are thousands of docs, not billions) and broadcasts; the corpus grams
    stream through the broadcast join exploded — one hash-agg shuffle keyed
    by doc_id, document text never shuffles. 100 TB corpus x fixed
    benchmark stays linear.
    """
    bench_sh = (
        doc_shingles(benchmark, k) if bench_shingles is None else bench_shingles
    )
    corpus_sh = (
        doc_shingles(corpus, k) if corpus_shingles is None else corpus_shingles
    )
    bench_grams = F.broadcast(bench_sh.select("shingle").distinct())
    return (
        corpus_sh
        .join(bench_grams, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


# Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the
# MOSS algorithm): content-defined sampling of char k-gram hashes such that
# any two documents sharing a substring of length >= WINNOW_K + WINNOW_G - 1
# are GUARANTEED to share at least one selected fingerprint, regardless of
# where the substring sits in each document (stride sampling has no such
# alignment guarantee). This is the exact-substring-level dedup complement
# to the token-shingle Jaccard path (Lee et al. 2021, arXiv:2107.06499,
# motivate removing long exact substrings specifically).
WINNOW_K = 20  # char window hashed
WINNOW_G = 8   # winnow window: min-hash of each G consecutive k-grams kept
WINNOW_MAX_DF_FRAC = 0.10  # hot-fingerprint cap (boilerplate guard)
WINNOW_MIN_DF_CAP = 4  # floor: a fingerprint in <= this many docs is never hot


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, g: int = WINNOW_G
) -> DataFrame:
    """(doc_id, fingerprint) — the winnowed k-gram hash sample of each doc.

    The k-gram hash array MUST materialize before the per-position
    ``array_min(slice(...))`` selection reads it: two adjacent projections
    would be collapsed by Catalyst (CollapseProject), inlining the md5-array
    expression into every element reference inside the selection lambda —
    re-evaluating the whole array per position, an O(len^2) md5 blowup
    (measured 11s -> 1.5s at sf0.1). The round-robin exchange between the
    projections is the collapse barrier; it also spreads the md5 work, and
    ships only (doc_id, wins) — a few hundred longs per doc.
    Selection is TRUE winnowing (Schleimer et al. 2003, "Winnowing: Local
    Algorithms for Document Fingerprinting"): the selected set is exactly the
    per-window minima — for every window of G consecutive k-gram hashes, the
    window's minimum hash is kept. Any substring of length >= k + g - 1 spans
    at least one full window in both documents, and that window's minimum
    depends only on the shared characters, so the two docs are guaranteed to
    share that fingerprint regardless of alignment. (An earlier keep-iff-
    min-of-own-forward-window variant was a strict SUBSET of this set and
    broke the guarantee — whether a position survived depended on hashes
    beyond the shared region.) Documents shorter than k contribute no
    fingerprints (dedup_exact owns the tiny-doc case)."""
    text = F.col("text")
    n_w = F.length(text) - k + 1
    wins = F.transform(
        F.sequence(F.lit(1), n_w),
        lambda i: md5_long(F.substr(text, i, F.lit(k))),
    )
    w = _spread(docs.filter(F.length(text) >= k)).select(
        "doc_id", wins.alias("wins")
    )
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    w = w.repartition(parallelism, "doc_id")
    n = F.size(F.col("wins"))
    n_sel = n - g + 1
    selected = F.when(
        n >= g,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_sel),
                lambda j: F.array_min(F.slice(F.col("wins"), j, g)),
            )
        ),
    ).otherwise(F.array(F.array_min(F.col("wins"))))
    return w.select("doc_id", F.explode(selected).alias("fingerprint"))


def substring_dup_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    k: int = WINNOW_K,
    g: int = WINNOW_G,
    max_df_frac: float | None = WINNOW_MAX_DF_FRAC,
    split_pred: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` winnowed substring fingerprints —
    the distributed form of exact-substring dedup: candidates come from the
    fingerprint equi-self-join (same blocked shape as the shingle join, cost
    sum-over-fingerprints of df^2, never all-pairs), with boilerplate
    fingerprints (df > ``max_df_frac`` of the corpus) dropped before the
    join exactly like the stop-shingle cap.

    ``split_pred`` (round 10): a doc_id -> boolean Column factory that
    restricts the output to CROSS-split pairs (one side satisfies the
    predicate, the other does not). The contamination report only wants
    bench-vs-corpus pairs; generating the full self-join and filtering
    after computes every corpus-corpus candidate (the overwhelming
    majority: with a ~2% bench split the cross slice is ~4% of the
    candidate volume) just to drop it. Pushing the split INTO the join
    is provably the same pair set: the two sides are disjoint by
    construction, the hot-fingerprint cap is still computed over the
    FULL corpus before the split, and |fp_a ∩ fp_b| per unordered pair
    does not depend on which side generated it
    (tests/test_r10_optimizations.py holds the two forms equal)."""
    # the fingerprint frame feeds the hot-cap aggregate AND both self-join
    # sides; without a persist the whole winnow pass (one md5 per char
    # window of every doc — the query's dominant compute) re-executes per
    # scan (4x measured in the sf0.1 plan: no exchange reuse fires because
    # each branch re-derives the projection). Same persist-the-substrate
    # device as minhash_lsh_dups' `base`; the session cache hygiene
    # reclaims it after the query's action.
    fp = winnow_fingerprints(docs, k, g).persist()
    if max_df_frac is not None:
        tot = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
        # the fractional cap has an ABSOLUTE floor (WINNOW_MIN_DF_CAP): on a
        # small corpus frac * n rounds below 1 and would mark every
        # fingerprint hot; a fingerprint shared by a handful of docs is
        # genuine dup signal, not boilerplate
        hot = (
            fp.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("_df"))
            .crossJoin(F.broadcast(tot))
            .filter(
                F.col("_df")
                > F.greatest(
                    F.col("_n_docs") * F.lit(float(max_df_frac)),
                    F.lit(float(WINNOW_MIN_DF_CAP)),
                )
            )
            .select("fingerprint")
        )
        fp = fp.join(F.broadcast(hot), "fingerprint", "left_anti")
    if split_pred is None:
        a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
        b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
        pairs = a.join(b, "fingerprint").filter(F.col("doc_a") < F.col("doc_b"))
    else:
        sa = fp.filter(split_pred(F.col("doc_id"))).select(
            F.col("doc_id").alias("_s"), "fingerprint"
        )
        sb = fp.filter(~split_pred(F.col("doc_id"))).select(
            F.col("doc_id").alias("_o"), "fingerprint"
        )
        # disjoint sides -> each unordered pair appears in exactly one
        # orientation; canonicalize to the full form's doc_a < doc_b
        pairs = sa.join(sb, "fingerprint").select(
            F.least("_s", "_o").alias("doc_a"),
            F.greatest("_s", "_o").alias("doc_b"),
        )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= int(min_shared))
    )


# content-defined chunking: boundary gram width, divisor (expected chunk
# length ~ CDC_DIVISOR + CDC_GRAM chars), and the cross-doc share gate
CDC_GRAM = 16
CDC_DIVISOR = 64


def cdc_chunks(
    docs: DataFrame, k: int = CDC_GRAM, divisor: int = CDC_DIVISOR
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC family): split each
    document at positions where the rolling k-gram hash satisfies
    ``hash % divisor == 0``, so chunk boundaries depend only on LOCAL
    content. An insertion early in a document shifts every fixed-size
    block but leaves all content-defined boundaries after the edit window
    intact — which is why storage dedup and incremental corpus diffing
    chunk this way instead of every-N-chars.

    Semantics (shared verbatim with the DuckDB oracle): a cut falls after
    the LAST character of each boundary gram (positions i + k - 1 for
    each gram start i with md5_60(text[i:i+k]) % divisor == 0); the final
    chunk always runs to end-of-doc. Docs shorter than k (no gram fits)
    are a single chunk; empty docs contribute none. Production FastCDC
    adds min/max chunk bounds (which make each boundary depend on the
    previous accepted one — a sequential fold); this exact stateless form
    keeps both engines trivially identical and is the textbook LBFS rule.

    Scale shape: the gram-hash scan is a narrow per-row array expression
    behind an exchange barrier (the winnow_fingerprints CollapseProject
    trap: the cuts array must materialize before the per-chunk substring
    lambda reads it, or the md5 scan re-runs per chunk). Output is
    (doc_id, chunk_idx, chunk_hash, chunk_len) — the chunk travels as its
    60-bit md5, never the string."""
    text = F.col("text")
    n = F.length(text)
    n_w = n - k + 1
    cuts_raw = F.when(
        n_w >= 1,
        F.filter(
            F.transform(
                F.sequence(F.lit(1), n_w),
                lambda i: F.when(
                    md5_long(F.substr(text, i, F.lit(k))) % divisor == 0,
                    i + k - 1,
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<int>"))
    # ascending by construction; append the end-of-doc sentinel unless the
    # last gram already cut there
    with_cuts = _spread(docs.filter(n >= 1)).select(
        "doc_id",
        text.alias("text"),
        F.when(
            (F.size(cuts_raw) == 0) | (F.element_at(cuts_raw, -1) != n),
            F.concat(cuts_raw, F.array(n)),
        )
        .otherwise(cuts_raw)
        .alias("cuts"),
    )
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    with_cuts = with_cuts.repartition(parallelism, "doc_id")
    cuts = F.col("cuts")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(cuts)),
        lambda j: F.struct(
            (j - 1).cast("long").alias("chunk_idx"),
            F.substr(
                F.col("text"),
                F.when(j == 1, F.lit(1)).otherwise(
                    F.element_at(cuts, (j - 1).cast("int")) + 1
                ),
                F.element_at(cuts, j.cast("int"))
                - F.when(j == 1, F.lit(0)).otherwise(
                    F.element_at(cuts, (j - 1).cast("int"))
                ),
            ).alias("chunk"),
        ),
    )
    return with_cuts.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        md5_long(F.col("c.chunk")).alias("chunk_hash"),
        F.length(F.col("c.chunk")).cast("long").alias("chunk_len"),
    )


def cdc_dedup_report(
    docs: DataFrame, k: int = CDC_GRAM, divisor: int = CDC_DIVISOR
) -> DataFrame:
    """Per-document chunk-level dedup accounting over :func:`cdc_chunks`:
    how many of a doc's chunks (and what fraction of its characters) also
    appear in at least one OTHER document — the number a storage-dedup /
    incremental-ingest planner acts on.

    A chunk value is "shared" when its hash occurs in >= 2 distinct docs;
    all of its occurrences in every doc then count as shared. Scale
    shape: chunk table -> (hash)-key agg for the shared set (two-level
    exact distinct-doc count, map-side partials) -> hash-key join back ->
    per-doc agg. The shared-hash table is duplicate-sized, far smaller
    than the corpus; dup_ratio divides exact BIGINT char counts as
    doubles, rounded to 6dp (IEEE-identical in both engines).

    The chunk table persists across its two consumers (shared-set agg +
    flagged join): without the pin, the per-character md5 gram scan — the
    operator's dominant cost — runs twice (the `_filtered_shingle_arrays`
    precedent; session.free_caches reclaims it between queries)."""
    ch = cdc_chunks(docs, k, divisor).persist()
    shared = (
        ch.groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_hash")
    )
    flagged = ch.join(
        shared.withColumn("_shared", F.lit(1)), "chunk_hash", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.coalesce(F.col("_shared"), F.lit(0)))
            .cast("long")
            .alias("n_shared_chunks"),
            F.sum("chunk_len").cast("long").alias("total_chars"),
            F.sum(
                F.when(F.col("_shared").isNotNull(), F.col("chunk_len")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("shared_chars"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared_chunks",
            "total_chars",
            "shared_chars",
            F.round(
                F.col("shared_chars").cast("double")
                / F.col("total_chars").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )



def cdc_incremental_dedup(
    index_docs: DataFrame,
    batch_docs: DataFrame,
    k: int = CDC_GRAM,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Incremental chunk-level dedup: an INCOMING document batch is
    content-defined-chunked and its chunk hashes probe the standing chunk
    index — the ingest-time storage-dedup decision ("how much of this new
    doc do we already have?") without ever re-pairing the corpus with
    itself. The third member of the incremental family
    (:func:`incremental_minhash_dups`,
    similarity.embedding_dup_batch_lsh) and the reason content-defined
    boundaries exist at all: an edited re-crawl shares every chunk after
    the edit point, so its dup_ratio exposes it as a re-ingest.

    Scale shape: at 100 TB the index is a bucketed table keyed by
    chunk_hash; per batch the probe join's build side is the batch's
    DISTINCT chunk-hash set (batch-sized, broadcastable), so the standing
    index streams through it map-side — cost O(index scan) worst case,
    O(batch + matches) with hash-partitioned storage. Output: per batch
    doc, the chunk/char counts already present in the index and the
    dup_ratio (1.0 = pure re-ingest, 0.0 = all-new content)."""
    batch_ch = cdc_chunks(batch_docs, k, divisor)
    idx_hashes = cdc_chunks(index_docs, k, divisor).select("chunk_hash").distinct()
    flagged = batch_ch.join(
        idx_hashes.withColumn("_hit", F.lit(1)), "chunk_hash", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_known_chunks"),
            F.sum("chunk_len").cast("long").alias("total_chars"),
            F.sum(
                F.when(F.col("_hit").isNotNull(), F.col("chunk_len")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("known_chars"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_known_chunks",
            "total_chars",
            "known_chars",
            F.round(
                F.col("known_chars").cast("double")
                / F.col("total_chars").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )

"""Scale-hardening guards: the stop-shingle document-frequency cap, the
reliable-checkpoint path for iterative connected components, and the
bounded-candidates contract on driver-side sketch probing.

Each guard exists for the 100 TB posture: the df cap bounds the shingle
self-join's worst case (one ubiquitous shingle otherwise makes candidate
generation quadratic), reliable checkpoints let the CC loop survive
executor loss, and the candidate cap turns an accidental full-domain
collect into a loud error instead of a driver OOM.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.operators import dedup, sketches
from cdc_poc_spark.operators.clustering import connected_components


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# one 3-token stop-shingle every document shares, plus per-pair rare text
_STOP = "all rights reserved"


def test_df_cap_drops_stop_shingle_pairs(spark):
    # Docs 1/2 share ONLY the ubiquitous boilerplate shingle; docs 3/4
    # share their full rare text. With the cap, the boilerplate shingle is
    # excluded from every shingle set, so 1/2 must NOT pair while 3/4 must.
    rows = [
        (1, f"{_STOP} alpha beta gamma delta"),
        (2, f"{_STOP} epsilon zeta eta theta"),
        (3, f"{_STOP} iota kappa lambda mu"),
        (4, f"{_STOP} iota kappa lambda mu"),
        (5, f"{_STOP} nu xi omicron pi"),
    ]
    pairs = dedup.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.2, cache=False
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(3, 4)}
    # and the surviving pair's Jaccard is over the FILTERED sets: identical
    # filtered shingle sets -> exactly 1.0
    j = pairs.filter((F.col("doc_a") == 3) & (F.col("doc_b") == 4)).first()
    assert j["jaccard"] == 1.0


def test_df_cap_disabled_restores_raw_candidates(spark):
    rows = [
        (1, f"{_STOP} alpha beta gamma delta"),
        (2, f"{_STOP} epsilon zeta eta theta"),
        (3, f"{_STOP} iota kappa lambda mu"),
    ]
    raw = dedup.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.01, cache=False, max_df_frac=None
    )
    # every pair shares the boilerplate shingle -> all 3 pairs are
    # candidates and clear the tiny threshold
    assert raw.count() == 3


def test_df_cap_keeps_sub_threshold_shingles(spark):
    # a shingle in exactly half the corpus (not MORE than half) survives
    rows = [
        (1, "shared common phrase one two three"),
        (2, "shared common phrase four five six"),
        (3, "unrelated text body seven eight nine"),
        (4, "another unrelated body ten eleven twelve"),
    ]
    pairs = dedup.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.1, cache=False
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got


def test_cc_reliable_checkpoint_path(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (30, 31), (31, 32), (32, 10)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    with tempfile.TemporaryDirectory(prefix="cc_ckpt_") as d:
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges, checkpoint_dir=d).collect()
        }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 30: 10, 31: 10, 32: 10}


def test_heavy_hitters_candidate_cap_raises(spark):
    facts = spark.range(0, 1000).select(F.col("id").alias("k"))
    candidates = spark.range(0, 50).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="max_keys"):
        sketches.heavy_hitters_over_candidates(
            facts, candidates, "k", max_keys=10
        )


def test_heavy_hitters_within_cap_still_works(spark):
    facts = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    candidates = spark.range(0, 3).select(F.col("id").alias("k"))
    out = sketches.heavy_hitters_over_candidates(
        facts, candidates, "k", max_keys=10
    )
    rows = {r["k"]: r["est_count"] for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    # CMS overestimates only; exact here because the domain is tiny
    assert all(v >= 20 for v in rows.values())


# --- winnowing substring dedup (Schleimer et al. 2003) ---


def test_winnow_guarantee_alignment_independent(spark):
    """Any two docs sharing a substring of length >= K + G - 1 (27) must
    share a winnowed fingerprint REGARDLESS of where the substring sits in
    each document — the property stride-sampling lacks."""
    shared = "the quick brown fox jumps over the lazy dog tonight"  # 51 chars
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB", "en"),
            (2, "a completely different long prefix text here wow " + shared, "en"),
            (3, "no overlap with the others at all, none whatsoever here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared_fp
        for r in dedup.substring_dup_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_hot_fingerprint_cap(spark):
    """A fingerprint present in most of the corpus (shared boilerplate) is
    dropped before the self-join, exactly like the stop-shingle cap."""
    boiler = "this exact same boilerplate sentence appears in every document"
    docs = spark.createDataFrame(
        [(i, boiler, "en") for i in range(10)],
        "doc_id long, text string, lang string",
    )
    # every doc identical -> every fingerprint has df=10 > 10% cap -> no pairs
    assert dedup.substring_dup_pairs(docs).count() == 0
    # cap disabled -> all 45 pairs
    assert dedup.substring_dup_pairs(docs, max_df_frac=None).count() == 45


def test_winnow_short_docs_no_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, "tiny", "en"), (2, "tiny", "en")],
        "doc_id long, text string, lang string",
    )
    assert dedup.winnow_fingerprints(docs).count() == 0


def test_containment_catches_subset_docs_jaccard_misses(spark):
    # doc 2 is a verbatim quote of a small slice of doc 1: containment of
    # the quote is 1.0 while Jaccard is far below any dedup threshold
    big_toks = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(10, 16))  # 6 tokens inside big
    # 5 docs so the df<=0.5*n cap (2.5) keeps the df=2 shared shingles
    rows = [
        (1, big_toks),
        (2, quote),
        (3, "totally unrelated text body here now"),
        (4, "more filler prose with other words"),
        (5, "yet another disjoint document entirely"),
    ]
    docs = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
        for r in dedup.containment_pairs(docs, threshold=0.9, cache=False).collect()
    }
    assert set(got) == {(1, 2)}
    ca, cb = got[(1, 2)]
    assert cb == 1.0 and ca < 0.2  # quote fully contained; big barely overlaps
    # and the Jaccard path at its own threshold must NOT pair them
    j = dedup.ngram_jaccard_pairs(docs, threshold=0.8, cache=False)
    assert not any(
        (r["doc_a"], r["doc_b"]) == (1, 2) for r in j.collect()
    )


def test_importance_weights_prefer_target_domain(spark):
    from cdc_poc_spark.operators.sampling import importance_weights

    rows = [
        (1, "alpha beta gamma alpha beta", "en", "tgt"),
        (2, "alpha beta gamma gamma beta", "en", "tgt"),
        (3, "delta epsilon zeta eta theta", "en", "other"),
        (4, "alpha beta gamma beta alpha", "en", "other"),  # target-like text
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    w = {r.doc_id: r.log_weight for r in importance_weights(docs, "tgt").collect()}
    # target-vocabulary docs outweigh the off-domain doc, wherever they live
    assert w[1] > w[3] and w[2] > w[3] and w[4] > w[3]
    n = {r.doc_id: r.n_tokens for r in importance_weights(docs, "tgt").collect()}
    assert n[1] == 5


# --- negative sampling: O(users x pool), never O(users x catalog) ---


def test_negative_samples_plan_has_no_cartesian(spark):
    """The affine-permutation pool is generated by INVERTING the map (one
    explode of pool slots per user + a broadcast rank join) — the physical
    plan must contain neither a cartesian product nor any join of the users
    frame that isn't the broadcast rank lookup / interaction anti-join."""
    from cdc_poc_spark.plans.registry import queries

    df = queries(fresh=False)["wh_negative_samples"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan  # the O(pool) generator path


def test_global_rank_matches_window_rank(spark):
    """global_rank (bucketed distributed rank) must agree with the
    single-partition Window rank on unique keys, including skewed ones."""
    from pyspark.sql import Window

    from cdc_poc_spark.functions.partitioning import global_rank

    # skewed, gappy, unordered keys
    keys = [1, 2, 3, 1000, 1001, 5_000_000, 7, 42, 999_999, 11]
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(4)
    got = {r["k"]: r["_r"] for r in global_rank(df, "k").collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_global_rank_survives_full_int64_key_domain(spark):
    """Ranking 60-bit md5-domain keys (the repo's standard hash domain)
    must not overflow: the bucket expression runs in double space (divide
    by the span before scaling), so (col - lo) * n_buckets never forms an
    int64 intermediate. Pinned under ANSI, where the round-4 shape raised
    ARITHMETIC_OVERFLOW on exactly these keys."""
    from pyspark.sql import Window

    from cdc_poc_spark.functions.partitioning import global_rank

    keys = [0, 1, (1 << 60) - 1, 1 << 59, (1 << 60) - 2, 123456789,
            (1 << 58) + 7, 9_223_372_036_854_775_000, -9_000_000_000_000_000_000]
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(3)
    with _ansi(spark):
        got = {r["k"]: r["_r"] for r in global_rank(df, "k").collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_pmod_mul_exact_past_int64_multiply_bound(spark):
    """_pmod_mul (Horner base-2^20 modular multiply) must agree with
    Python's exact modmul for moduli past ~3e9, where the plain
    pmod(x * mult, n) single multiply overflows int64. Pinned under ANSI."""
    import random

    from pyspark.sql import functions as F

    from cdc_poc_spark.plans.registry import _pmod_mul

    rng = random.Random(11)
    with _ansi(spark):
        for mod in (2, 97, 2**31 - 1, 4_000_000_007, (1 << 41) + 9):
            mult = rng.randrange(1, mod)
            xs = [0, mod - 1] + [rng.randrange(0, mod) for _ in range(20)]
            df = spark.createDataFrame([(x,) for x in xs], "x long")
            got = [r[0] for r in df.select(_pmod_mul(F.col("x"), mult, mod)).collect()]
            assert got == [x * mult % mod for x in xs], f"mod={mod}"


from contextlib import contextmanager


@contextmanager
def _ansi(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


# --- portable CMS: distributed probe, bounded counter table ---


def test_cms_portable_probe_is_broadcast_join_no_collect(spark):
    """The portable CMS probe must be a broadcast join of the counter
    table (<= depth*width rows) — never a cartesian product, never a
    driver-side collect of candidates (the candidate set may be any size)."""
    facts = spark.range(0, 5000).select((F.col("id") % 97).alias("k"))
    cands = spark.range(0, 50).select(F.col("id").alias("k"))
    out = sketches.cms_portable_heavy_hitters(facts, cands, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cms_portable_counter_table_is_bounded(spark):
    """Counter rows never exceed depth*width regardless of input size, and
    counts sum to depth * n_rows (every row lands in exactly one cell per
    depth)."""
    facts = spark.range(0, 20000).select((F.col("id") % 4096).alias("k"))
    counters = sketches.cms_portable_counters(facts, "k")
    n = counters.count()
    assert n <= sketches.CMS_PORT_DEPTH * sketches.CMS_PORT_WIDTH
    total = counters.agg(F.sum("cnt").alias("s")).first()["s"]
    assert total == sketches.CMS_PORT_DEPTH * 20000


def test_cms_portable_mergeability(spark):
    """Counter tables built on disjoint halves must sum cell-wise to the
    full table — the mergeable-sketch contract that makes the CMS a one
    -pass map-side aggregate at any scale."""
    full = spark.range(0, 2000).select((F.col("id") % 131).alias("k"))
    a = full.filter(F.col("k") % 2 == 0)
    b = full.filter(F.col("k") % 2 == 1)
    ca = sketches.cms_portable_counters(a, "k")
    cb = sketches.cms_portable_counters(b, "k")
    merged = (
        ca.unionByName(cb)
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cf = sketches.cms_portable_counters(full, "k")
    assert (
        merged.exceptAll(cf.select("d", "cell", "cnt")).count() == 0
        and cf.select("d", "cell", "cnt").exceptAll(merged).count() == 0
    )

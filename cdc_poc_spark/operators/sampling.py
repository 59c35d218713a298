"""Deterministic dataset splitting — the train/val/test assignment step of a
training-data pipeline.

`rand()`-based sampling is not reproducible across runs, partitionings, or
engines; the standard scale answer is hash bucketing: bucket =
H(seed || id) mod 100, split by bucket range. Properties that matter at
100 TB:

- pure per-row expression (no shuffle, no state, no sort) — the split of a
  row never depends on any other row;
- stable under re-partitioning, retries, and incremental reruns — a
  document keeps its split forever, so train/val contamination can't creep
  in when the corpus grows;
- portable: the md5-based bucket reproduces bit-identically in any engine
  (same family as the dedup/minhash hashes — functions.hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_seeded

SPLIT_SEED = "split-v1"
TRAIN_PCT = 90
VAL_PCT = 5


def assign_splits(
    docs: DataFrame,
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
    seed: str = SPLIT_SEED,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: its hash bucket (0-99) and split label
    (train / val / test by bucket range)."""
    bucket = md5_long_seeded(F.col(id_col), seed) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        F.col(id_col),
        F.col("lang"),
        bucket.alias("split_bucket"),
        split.alias("split"),
    )


def split_summary(assigned: DataFrame) -> DataFrame:
    """Per (split, lang) document counts — the stratification check run
    after every assignment."""
    return assigned.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


def domain_mix(docs: DataFrame) -> DataFrame:
    """Per-source corpus composition + uniform-mix resampling weights — the
    "domain mixing" step of corpus assembly (what fraction of tokens each
    source contributes, and how to reweight sampling toward a uniform mix).

    Token counts use the same chars/4 estimator as text_stats'
    ``est_bpe_tokens`` (cheap, deterministic, engine-portable). Scale shape:
    one column-pruned scan, one partial-agg shuffle on ``source`` (domain
    cardinality is tiny), then a 1-row total broadcast back — no second pass
    over the data. ``uniform_weight`` > 1 means the source is
    under-represented vs a uniform token mix and should be up-sampled.
    """
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.ceil(F.length("text") / F.lit(4.0)).cast("long")).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("t_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t_tokens"), 9).alias("token_share"),
        F.round(
            (F.col("t_tokens") / F.col("n_sources")) / F.col("n_tokens"), 9
        ).alias("uniform_weight"),
    )


WSAMPLE_SEED = "wsample-v1"
WSAMPLE_K = 50
_WSAMPLE_MOD = 1 << 40


def weighted_sample(
    docs: DataFrame,
    k: int = WSAMPLE_K,
    weight_col: str = "n_chars",
    seed: str = WSAMPLE_SEED,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-Res): rank by ln(u)/w with u a per-row
    hash-uniform in (0,1), take the top-k — each row's inclusion odds are
    proportional to its weight, yet the draw is a pure per-row expression:
    reproducible across engines, partitionings, and reruns (unlike
    ``rand()``-based sampling), and the top-k is a heap, not a sort.

    Output: (doc_id, weight, sample_key) — key rounded to 6 decimals,
    ranking on the raw double with doc_id tiebreak.
    """
    u = (
        (md5_long_seeded(F.col("doc_id"), seed) % F.lit(_WSAMPLE_MOD)).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(float(_WSAMPLE_MOD))
    key = F.log(u) / F.col(weight_col)
    return (
        # weight <= 0 rows are excluded EXPLICITLY (a zero-weight row has no
        # inclusion odds anyway): ln(u)/0 is an engine-dependent ±inf/null,
        # so both this operator and its DuckDB oracle must filter, not rely
        # on inf/null sort position agreeing by accident.
        docs.filter(F.col(weight_col) > 0)
        .select("doc_id", F.col(weight_col).alias("weight"), key.alias("_k"))
        .orderBy(F.desc("_k"), F.asc("doc_id"))
        .limit(k)
        # + 0.0 canonicalizes IEEE -0.0 to +0.0: a tiny negative key that
        # rounds to zero otherwise renders "-0.0" in one engine and "0.0"
        # in the other (found by the sf0.1 differential sweep)
        .select(
            "doc_id",
            "weight",
            (F.round(F.col("_k"), 6) + F.lit(0.0)).alias("sample_key"),
        )
    )


DOMAIN_CAP = 15
DOMAIN_CAP_SEED = "domcap-v1"


def domain_cap(
    docs: DataFrame,
    cap: int = DOMAIN_CAP,
    key: str = "source",
    seed: str = DOMAIN_CAP_SEED,
) -> DataFrame:
    """Per-domain quota capping — the curation step that stops one crawl
    source from dominating the mix: within each domain, rank documents by a
    seeded hash (a deterministic uniform shuffle, reproducible across
    engines and reruns) and keep the first ``cap``.

    One shuffle on the domain key; the per-domain sort is local. At 100 TB
    a single hot domain concentrates on one task — the mitigation is a
    hash-threshold pre-prune (keep rows whose rank KEY is below a
    per-domain quantile estimated from a broadcast count, a strict superset
    of the final top-cap) before this exact window; the pre-prune is an
    optimization that cannot change the result, so the operator contract —
    and the oracle — stay this exact formulation."""
    h = md5_long_seeded(F.col("doc_id"), seed)
    w = Window.partitionBy("domain").orderBy(F.asc("_h"), F.asc("doc_id"))
    ranked = (
        docs.select("doc_id", F.col(key).alias("domain"), h.alias("_h"))
        .withColumn("rank_in_domain", F.row_number().over(w))
        .filter(F.col("rank_in_domain") <= int(cap))
    )
    return ranked.select(
        "doc_id", "domain", F.col("rank_in_domain").cast("long").alias("rank_in_domain")
    )


DSIR_TARGET_SOURCE = "src0"


def importance_weights(
    docs: DataFrame, target_source: str = DSIR_TARGET_SOURCE
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): per document,

        log w(x) = sum over tokens [ ln p_tgt(w) - ln p_raw(w) ]

    over Laplace-smoothed unigram models, where the target model is fit on
    the documents of one source (the "high-quality domain") and the raw
    model on the whole corpus. High-weight documents are the ones
    importance resampling up-samples when steering pretraining toward the
    target domain; the weight doubles as a domain-affinity score.

    Scale shape: two explode + hash-agg count tables; scoring joins each
    doc token to the counts (token-key shuffle — at 100 TB the pruned
    models would broadcast instead, an approximation this exact
    formulation doesn't need at test scale). Determinism: per-doc log
    ratios re-assemble in position order and fold sequentially, so the
    double sum is oracle-bit-identical (the lm_score pattern)."""
    from .text_analysis import tokens

    base = docs.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    # exchange barrier: the posexplode lambda must read a materialized
    # token array, not re-run the tokenizer per position (CollapseProject)
    base = base.repartition(parallelism, "doc_id")
    doc_toks = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    )
    raw_counts = doc_toks.groupBy("token").agg(F.count(F.lit(1)).alias("cr"))
    tgt_toks = base.filter(F.col("source") == target_source).select(
        F.explode("toks").alias("token")
    )
    tgt_counts = tgt_toks.groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    stats = raw_counts.agg(
        F.sum("cr").alias("tot_r"), F.count(F.lit(1)).alias("v")
    ).crossJoin(F.broadcast(tgt_toks.agg(F.count(F.lit(1)).alias("tot_t"))))
    lr = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
        / (F.col("tot_t") + F.col("v")).cast("double")
    ) - F.log(
        (F.col("cr") + 1).cast("double")
        / (F.col("tot_r") + F.col("v")).cast("double")
    )
    scored = (
        doc_toks.join(raw_counts, "token")
        .join(tgt_counts, "token", "left")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "pos", lr.alias("lr"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lr"))),
                lambda s: s["lr"],
            ).alias("_lr")
        )
        .select(
            "doc_id",
            F.size("_lr").cast("long").alias("n_tokens"),
            F.round(
                F.aggregate("_lr", F.lit(0.0), lambda a, x: a + x), 6
            ).alias("log_weight"),
        )
    )


LANG_BALANCE_SEED = "langbal-v1"


def lang_balance(docs: DataFrame, seed: str = LANG_BALANCE_SEED) -> DataFrame:
    """Language-balanced downsampling — cap every language at the MINORITY
    language's document count, so a multilingual training mix isn't
    dominated by the highest-resource language (the uniform-mix limit of
    temperature sampling, tau -> infinity).

    Selection within a language is by seeded-hash rank (a deterministic
    uniform shuffle — same primitive as :func:`domain_cap`), so the kept
    set is reproducible across engines, reruns, and repartitioning, and
    GROWS MONOTONICALLY only via the cap, never by reshuffling survivors.

    Scale shape: one tiny groupBy(lang) count whose min() broadcasts as a
    1-row frame, then one window shuffle on the language key. Language is
    the canonical skewed key (one lang is usually >half the corpus); as
    with domain_cap, the production mitigation is a hash-threshold
    pre-prune per language before the exact window — a strict superset of
    the final top-cap, so the contract and oracle stay this exact
    formulation.

    Output: (doc_id, lang, rank_in_lang) for the kept documents."""
    floor_n = F.broadcast(
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.min("_n").alias("floor_n"))
    )
    h = md5_long_seeded(F.col("doc_id"), seed)
    w = Window.partitionBy("lang").orderBy(F.asc("_h"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", h.alias("_h"))
        .withColumn("rank_in_lang", F.row_number().over(w))
        .crossJoin(floor_n)
        .filter(F.col("rank_in_lang") <= F.col("floor_n"))
        .select(
            "doc_id",
            "lang",
            F.col("rank_in_lang").cast("long").alias("rank_in_lang"),
        )
    )


SHUFFLE_EXPORT_SEED = "shufexp"
SHUFFLE_EXPORT_SHARDS = 32


def shuffle_to_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = SHUFFLE_EXPORT_SHARDS,
    seed: str = SHUFFLE_EXPORT_SEED,
) -> DataFrame:
    """Deterministic global shuffle + sharding — the export step before
    writing training shards: every row draws a pseudorandom 60-bit key
    from the portable seeded-md5 family, lands in shard ``key % n_shards``
    and at the key's rank within that shard. The ordering is as good as a
    true uniform permutation (md5 keys are uniform and id-unique) while
    staying reproducible across engines and reruns — re-seeding gives an
    independent epoch order.

    Scale shape: ONE shuffle (the per-shard window), never a global sort;
    a shard's rows fit one writer task, so the downstream
    ``partitionBy(shard) ORDER BY pos`` write streams without a driver
    bottleneck. Ties in the key (astronomically rare) break on id."""
    key = md5_long_seeded(F.col(id_col), seed)
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(F.col(id_col), key.alias("shuffle_key"))
        .withColumn(
            "shard", (F.col("shuffle_key") % int(n_shards)).cast("int")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos", "shuffle_key")
    )


TEMP_ALPHA = 0.3


def temperature_weights(docs: DataFrame, alpha: float = TEMP_ALPHA) -> DataFrame:
    """Temperature-based multilingual sampling probabilities (the mC4 /
    XLM-R exponential-smoothing rule, Conneau et al. 2020,
    arXiv:1911.02116 §3): with corpus share s_l = n_l / N,

        p_l = s_l^alpha / sum_m s_m^alpha

    alpha < 1 up-samples low-resource languages; alpha = 1 reproduces the
    raw mix, alpha -> 0 the uniform mix (what :func:`lang_balance`
    realizes by hard capping). The ``boost`` column (p_l / s_l) is the
    per-language sampling multiplier a downstream weighted sampler uses.

    Determinism across engines: counts are exact integers and every
    division is a two-operand IEEE double op (correctly rounded, so
    bit-identical given identical inputs); pow() is the one libm call,
    snapped to a 9dp grid, and the normalizing SUM runs over that grid
    in DECIMAL so the denominator cannot depend on aggregation order.
    The whole operator is one language-key hash agg (a handful of
    groups) — the 100 TB cost is the corpus scan, nothing else."""
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    w_raw = F.round(
        F.pow(
            F.col("n_docs").cast("double") / F.col("n_total").cast("double"),
            F.lit(alpha),
        ),
        9,
    ).cast("decimal(20,10)")
    scored = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs").cast("double") / F.col("n_total").cast("double")).alias(
            "_share"
        ),
        w_raw.alias("_w"),
    )
    denom = scored.agg(F.sum("_w").alias("_denom"))
    p_raw = F.col("_w").cast("double") / F.col("_denom").cast("double")
    return scored.crossJoin(F.broadcast(denom)).select(
        "lang",
        "n_docs",
        F.round(F.col("_share"), 6).alias("share"),
        F.round(p_raw, 6).alias("p_sample"),
        F.round(p_raw / F.col("_share"), 6).alias("boost"),
    )


EPOCH_CAP = 4.0  # max repeats per language (Muennighoff et al. 2023: value
# of repeated data decays sharply past ~4 epochs)
BUDGET_MULT = 3.0  # the allocation query trains on 3x the corpus tokens


def token_budget_allocation(
    docs: DataFrame,
    budget_mult: float = BUDGET_MULT,
    alpha: float = TEMP_ALPHA,
    max_epochs: float = EPOCH_CAP,
) -> DataFrame:
    """Per-language training-token allocation under a repetition cap: split
    a token budget B across languages proportionally to the temperature
    probabilities p_l, but never above ``max_epochs`` repeats of a
    language's available tokens T_l — the epoch schedule a data-constrained
    pretraining run needs (temperature mixing per Conneau et al. 2020,
    repetition ceiling per Muennighoff et al. 2023).

    The capped allocation min(λ·p_l, C_l) with Σ = B (C_l = cap·T_l) is
    WATER-FILLING; instead of the textbook iterative loop this solves it in
    closed form with window functions: sort languages by saturation point
    r_l = C_l/p_l, and for each candidate boundary b (languages 1..b
    capped) compute λ_b = (B - Σ_{j<=b} C_j) / (Σ_{j>b} p_j); the unique
    valid boundary satisfies r_b <= λ_b <= r_{b+1}. Everything is lang-key
    aggregates and window scans over a handful of rows — no driver loop, no
    collect, and every arithmetic step is deterministic IEEE double so the
    DuckDB oracle reproduces the allocation exactly.

    B = budget_mult × total corpus tokens (scale-free), clamped to Σ C_l
    (the most the cap allows) so a valid boundary always exists.

    Output: (lang, tokens_avail, p_sample, tokens_alloc, epochs, capped).
    """
    from .text_analysis import text_stats

    toks = text_stats(docs).groupBy("lang").agg(
        F.sum("n_tokens").cast("long").alias("tokens_avail")
    )
    probs = temperature_weights(docs, alpha).select("lang", "p_sample")
    base = (
        toks.join(probs, "lang")
        .filter(F.col("p_sample") > 0)
        .select(
            "lang",
            "tokens_avail",
            "p_sample",
            (F.col("tokens_avail").cast("double") * F.lit(max_epochs)).alias(
                "cap_tokens"
            ),
        )
        .withColumn("r", F.col("cap_tokens") / F.col("p_sample"))
        .persist()  # lang-count rows; feeds boundary search AND final select
    )
    # cap_tokens are integers*cap (exact in double, order-independent);
    # p_sample sums would NOT be (6dp doubles) -> accumulate p in DECIMAL
    p_dec = F.col("p_sample").cast("decimal(18,6)")
    totals = base.agg(
        F.sum("cap_tokens").alias("sum_cap"),
        F.sum(p_dec).alias("sum_p"),
        (F.sum("tokens_avail").cast("double") * F.lit(budget_mult)).alias(
            "budget_raw"
        ),
    ).select(
        "sum_cap",
        "sum_p",
        F.least(F.col("budget_raw"), F.col("sum_cap")).alias("budget"),
    )
    w = Window.orderBy("r", "lang")
    ranked = (
        base.crossJoin(F.broadcast(totals))
        .select(
            "*",
            (F.sum("cap_tokens").over(w) - F.col("cap_tokens")).alias("cum_cap_before"),
            (F.sum(p_dec).over(w) - p_dec).alias("cum_p_before"),
            F.lag("r").over(w).alias("r_prev"),
        )
        .withColumn(
            "lam",
            (F.col("budget") - F.col("cum_cap_before"))
            / (F.col("sum_p") - F.col("cum_p_before")).cast("double"),
        )
        .withColumn(
            "valid",
            (F.col("lam") <= F.col("r"))
            & (F.col("r_prev").isNull() | (F.col("lam") >= F.col("r_prev"))),
        )
    )
    lam = (
        ranked.filter("valid")
        .orderBy("r", "lang")
        .limit(1)
        .select(F.col("lam").alias("lam_star"))
    )
    alloc = F.least(
        F.col("lam_star") * F.col("p_sample"), F.col("cap_tokens")
    )
    return (
        base.crossJoin(F.broadcast(lam))
        .select(
            "lang",
            "tokens_avail",
            "p_sample",
            F.round(alloc, 2).alias("tokens_alloc"),
            F.round(
                alloc / F.col("tokens_avail").cast("double"), 4
            ).alias("epochs"),
            F.when(
                F.col("lam_star") * F.col("p_sample") >= F.col("cap_tokens"), 1
            )
            .otherwise(0)
            .alias("capped"),
        )
        .orderBy("lang")
    )

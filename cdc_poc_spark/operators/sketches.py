"""Count-Min-Sketch heavy-hitter estimation (M6-class pipeline extension).

The 100 TB problem: "how often does key X occur overall?" for a set of
interesting keys, without paying a full groupBy shuffle of the fact table.
A Count-Min sketch is a bounded-memory, MERGEABLE summary: every partition
builds a tiny (depth x width) counter grid, the grids add cell-wise
map-side, and the driver gets one ~100 KB object no matter the input size.
Estimates are biased high by at most eps * N with probability `confidence`
(Cormode & Muthukrishnan 2005).

Spark-first: the sketch is built by the NATIVE `count_min_sketch` aggregate
(JVM-side, partial-aggregated — one scan, no Python in the data path);
probing deserializes the sketch bytes once on the driver through the
built-in `org.apache.spark.util.sketch.CountMinSketch`. Cell additions
commute, so estimates are partition-layout independent — deterministic for
a fixed seed, retry-safe.

Reference parity note: the reference has no approximate structures at all;
this extends its per-content running counts (RedisSink.java:199) to the
cardinalities where exact per-key state stops fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing

CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42

# heavy_hitters_over_candidates collects the candidate key set to the
# driver to probe the sketch; this cap turns "caller accidentally passed
# the full key domain" into a loud error instead of a driver OOM.
MAX_CANDIDATE_KEYS = 100_000


def cms_sketch(
    df: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
) -> bytes:
    """One-pass mergeable Count-Min sketch of `col` (integral or string),
    as the serialized sketch bytes."""
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("s")
    ).first()
    return bytes(row["s"])


def _jvm_sketch(spark: SparkSession, sketch: bytes):
    jvm = spark._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch)
    )


def estimate_counts(
    spark: SparkSession, sketch: bytes, keys: list[int]
) -> dict[int, int]:
    """Probe the sketch for each (long) key. Driver-side by design: the
    sketch is tiny and the candidate set is bounded (heavy-hitter sets are
    at most 1/threshold keys), so this never scales with the fact table."""
    cms = _jvm_sketch(spark, sketch)
    return {int(k): int(cms.estimateCount(int(k))) for k in keys}


def heavy_hitters_over_candidates(
    facts: DataFrame,
    candidates: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
    max_keys: int = MAX_CANDIDATE_KEYS,
) -> DataFrame:
    """Estimated total occurrence count in `facts` for every key in
    `candidates[col]`, highest first.

    `facts` is scanned exactly once (the sketch aggregate); `candidates`
    must be driver-sized (it is collected to probe the sketch) — in the
    intended pattern it is the output of a selective filter, e.g. "keys
    active in the most recent slice", never the full key domain. The
    ``max_keys`` bound ENFORCES that contract: the collect is capped at
    max_keys + 1 rows, and exceeding the cap raises instead of silently
    pulling an unbounded key set onto the driver.
    """
    spark = facts.sparkSession
    sketch = cms_sketch(facts, col, eps, confidence, seed)
    distinct_keys = candidates.select(col).distinct()
    keys = [r[0] for r in distinct_keys.limit(max_keys + 1).collect()]
    if len(keys) > max_keys:
        raise ValueError(
            f"heavy_hitters_over_candidates: candidate key set exceeds "
            f"max_keys={max_keys}; pass a selective candidate set (or raise "
            f"max_keys explicitly if the driver can hold it)"
        )
    est = estimate_counts(spark, sketch, keys)
    out = spark.createDataFrame(
        sorted(est.items(), key=lambda kv: (-kv[1], kv[0])),
        f"{col} long, est_count long",
    )
    return out


# ---------------------------------------------------------------------------
# HyperLogLog-style mergeable cardinality sketch (Flajolet et al. 2007).
#
# Spark ships approx_count_distinct (HLL++), but its register state is
# engine-internal: the sketch can't be stored, shipped, or merged across
# snapshots, and its estimates can't be cross-checked by another engine.
# This implementation builds the registers as a plain DataFrame from the
# repo's portable md5-60 hash, so
#   - the register table IS the sketch: 2^p rows of (register, max_rho)
#     integers, mergeable across any partitioning of the input by a
#     groupBy(register).max(max_rho) — the classic union-max;
#   - the DuckDB oracle reproduces registers AND estimates bit-for-bit
#     (the harmonic denominator is a sum of dyadic rationals 2^-rho with
#     rho <= 41, exactly representable in double for every partial sum, so
#     the float math is order-independent and engine-independent).
#
# 100 TB posture: one scan, map-side partial max per register, 2^p-row
# shuffle. The sketch for ANY slice (per day, per topic) is 2^p small rows;
# cross-slice cardinalities come from merging sketches, never rescanning.
# ---------------------------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
HLL_W = 40  # rho suffix width in bits; rho ranges over [1, HLL_W + 1]
# alpha_m bias constant for m >= 128 (Flajolet et al. 2007, fig. 3);
# computed once here and embedded as the same double literal in the oracle
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_registers(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """The mergeable HLL sketch of ``col`` (optionally per group) as a
    DataFrame of (group_cols..., register, max_rho).

    register = low p bits of md5_60(value); rho = 1 + leading zeros of the
    next W bits (via length(bin(suffix)) — integer-exact in both engines).
    """
    h = hashing.md5_long(F.col(col))
    reg = h.bitwiseAND(F.lit(HLL_M - 1))
    suf = F.shiftright(h, HLL_P).bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = F.when(suf == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(suf))
    )
    groups = [*(group_cols or []), "register"]
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *(group_cols or []),
            reg.cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*groups)
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """HLL estimate from a register frame: raw harmonic estimate
    alpha_m * m^2 / sum_j 2^-M_j (empty registers contribute 2^0 = 1 each)
    with the standard small-range linear-counting correction — when
    raw <= 2.5m and zero registers exist, m * ln(m / V) (Flajolet et al.
    2007 fig. 3; without it the raw estimate floors at ~0.72m for tiny
    cardinalities).

    Cross-engine determinism: the harmonic denominator is an
    order-independent sum of exactly-representable dyadic doubles, so the
    raw estimate — and therefore the correction BRANCH — is bit-identical
    in Spark and DuckDB; ln() agrees to ulps and both paths round to 4dp.
    """
    v = F.lit(HLL_M) - F.count(F.lit(1))  # zero (empty) registers
    denom = v + F.sum(F.pow(F.lit(2.0), -F.col("max_rho")))
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / denom
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v)
    est = F.when((raw <= 2.5 * HLL_M) & (v > 0), F.round(lc, 4)).otherwise(
        F.round(raw, 4)
    )
    gb = registers.groupBy(*group_cols) if group_cols else registers.groupBy()
    return gb.agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        est.alias("est_distinct"),
    )


def hll_user_report(events: DataFrame) -> DataFrame:
    """Distinct-user cardinality dashboard: per-event-type HLL estimate plus
    the ALL scope obtained by MERGING the per-type sketches (union-max over
    registers — no second scan of the fact table), each next to its exact
    count(distinct) and the relative error in percent.

    Scans events twice total (registers + exact verification); a production
    run at 100 TB would drop the exact branch and pay one scan.
    """
    regs = hll_registers(events, "user_id", ["event_type"]).persist()
    per = hll_estimate(regs, ["event_type"]).withColumnRenamed(
        "event_type", "scope"
    )
    merged = regs.groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    allsc = hll_estimate(merged).select(
        F.lit("ALL").alias("scope"), "n_registers", "est_distinct"
    )
    ests = per.unionByName(allsc)

    pairs = (
        events.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .persist()
    )
    exact_per = pairs.groupBy(F.col("event_type").alias("scope")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    exact_all = (
        pairs.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
        .select(F.lit("ALL").alias("scope"), "exact_distinct")
    )
    exacts = exact_per.unionByName(exact_all)

    return (
        ests.join(exacts, "scope")
        .select(
            "scope",
            "n_registers",
            "est_distinct",
            "exact_distinct",
            F.round(
                (F.col("est_distinct") - F.col("exact_distinct"))
                * F.lit(100.0)
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err_pct"),
        )
        .orderBy("scope")
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram -> quantile estimation.
#
# The second sketch family: percentile dashboards over arbitrary slices
# without a per-slice sort. All scopes bin onto ONE shared grid (global
# min/max), so per-scope histograms merge by plain addition — the ALL scope
# below is computed from the per-type registers, never by rescanning.
# Estimates are the classic interpolated nearest-rank within the target
# bin. Unlike percentile_approx/GK (engine-internal, non-portable), every
# step here is deterministic double arithmetic the DuckDB oracle replays
# bit-for-bit.
#
# 100 TB posture: one min/max scan (tiny broadcast), one scan to bin
# (map-side partial counts), nbins-row shuffles thereafter.
# ---------------------------------------------------------------------------

HIST_BINS = 256
HIST_QUANTILES = (0.5, 0.9, 0.99)


def hist_registers(
    df: DataFrame,
    col: str,
    nbins: int = HIST_BINS,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram counts of ``col`` per group on a GLOBAL
    [min, max] grid: (group_cols..., bin, cnt, lo, width). The shared grid
    is what makes per-group registers mergeable (sum cnt by bin)."""
    stats = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).select(
        "lo",
        ((F.col("hi") - F.col("lo")) / F.lit(float(nbins))).alias("width"),
    )
    binned = (
        df.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            *(group_cols or []),
            "lo",
            "width",
            F.least(
                F.when(
                    F.col("width") > 0,
                    F.floor(
                        (F.col(col).cast("double") - F.col("lo"))
                        / F.col("width")
                    ),
                ).otherwise(F.lit(0)),
                F.lit(nbins - 1),
            )
            .cast("int")
            .alias("bin"),
        )
    )
    groups = [*(group_cols or []), "bin", "lo", "width"]
    return binned.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_quantiles(
    registers: DataFrame,
    quantiles: tuple[float, ...] = HIST_QUANTILES,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Interpolated quantile estimates from a histogram register frame:
    for each q, the bin holding rank ceil(q*N) with linear interpolation
    inside it. Output (group_cols..., quantile, est_value, n_rows)."""
    gcols = group_cols or []
    w = Window.partitionBy(*gcols).orderBy("bin") if gcols else (
        Window.orderBy("bin")
    )
    cum = registers.select(
        *gcols,
        "bin",
        "lo",
        "width",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("total"),
    )
    qf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "quantile double"
    )
    target = F.ceil(F.col("quantile") * F.col("total").cast("double"))
    est = F.col("lo") + F.col("width") * (
        F.col("bin").cast("double")
        + (target.cast("double") - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(qf))
        .filter(
            ((F.col("cum") - F.col("cnt")) < target) & (target <= F.col("cum"))
        )
        .select(
            *gcols,
            "quantile",
            F.round(est, 4).alias("est_value"),
            F.col("total").cast("long").alias("n_rows"),
        )
    )


def hist_value_report(events: DataFrame) -> DataFrame:
    """Quantile dashboard for events.value: p50/p90/p99 per event_type from
    per-type histograms on the global grid, plus the ALL scope obtained by
    MERGING the per-type registers (sum by bin — no rescan)."""
    regs = hist_registers(
        events, "value", group_cols=["event_type"]
    ).persist()
    per = hist_quantiles(regs, group_cols=["event_type"]).withColumnRenamed(
        "event_type", "scope"
    )
    merged = regs.groupBy("bin", "lo", "width").agg(
        F.sum("cnt").alias("cnt")
    )
    allsc = hist_quantiles(merged).select(
        F.lit("ALL").alias("scope"), "quantile", "est_value", "n_rows"
    )
    return per.unionByName(allsc).orderBy("scope", "quantile")


# ------------------------- KMV (theta) distinct sketch ----------------------

KMV_K = 64
KMV_HASH_SPACE = 1 << 60  # md5_long values are uniform in [0, 2^60)


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """K-minimum-values distinct sketch per group (Beyer et al. 2007; the
    theta-sketch family): the ``k`` smallest distinct 60-bit hashes of the
    value column — a bounded, MERGEABLE summary that, unlike HLL, supports
    set INTERSECTION, because the retained hashes are a uniform sample of
    the distinct values below a known threshold.

    Fully deterministic (no seed-dependent registers, no floats): two
    engines retain the exact same hash sets, so estimates — integer
    arithmetic throughout — hash-match across engines, not merely agree
    within error bounds.

    Plan: one distinct on (group, hash) then a per-group rank; the sort is
    local to each group's reducer. On a cluster the same sketch is built
    mergeably (per-partition k-smallest, then k-smallest of the union —
    the rank formulation here is the semantic contract both reduce to).

    Output: (group, h, rn) with rn = 1..k ascending by hash."""
    h = hashing.md5_long(F.col(value_col).cast("string"))
    d = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("grp", "h", "rn")
    )


def kmv_setops(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = KMV_K,
) -> DataFrame:
    """Distinct-count set algebra across groups from KMV sketches: for
    every group pair (a < b), the estimated distinct values of each side,
    of the union, and of the intersection — the "how many users did BOTH
    X and Y" question HLL structurally cannot answer.

    Estimator (all integer, exact cross-engine):
      - a group with fewer than k distinct hashes is EXACT (theta = the
        whole hash space, estimate = retained count);
      - otherwise theta = the k-th smallest hash and
        est = (k-1) * SPACE div theta (the unbiased KMV estimator);
      - union: k smallest of the merged hash sets, same rule;
      - intersection: X = |common hashes below min(theta_a, theta_b)|,
        est = X * SPACE div min_theta (Beyer et al.'s scaled sample).

    Only sketch rows (|groups| x k) ever join — the fact table is touched
    once by the sketch build."""
    return kmv_setops_from_sketch(kmv_sketch(events, group_col, value_col, k), k)


def kmv_setops_from_sketch(sk: DataFrame, k: int = KMV_K) -> DataFrame:
    """The set-algebra half of :func:`kmv_setops`, computable from any
    (grp, h, rn) sketch frame — including one ACCUMULATED incrementally
    with :func:`kmv_merge` (the streaming twin maintains exactly this
    frame and must produce identical estimates, by the mergeability
    property)."""
    # per-group theta + exact-mode flag
    stats = sk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    space = F.lit(KMV_HASH_SPACE).cast("long")
    # (k-1) * 2^60 exceeds int64: the multiply runs in DECIMAL(38,0)
    # (exact, = DuckDB's HUGEINT), the integral quotient is < 2^63 for any
    # kth >= 8 (i.e. anything under ~2^57 distinct values) so the long
    # cast is safe
    _est_expr = (
        f"cast((cast({k} - 1 as decimal(38,0))"
        f" * cast({KMV_HASH_SPACE} as decimal(38,0)))"
        " div cast({kth} as decimal(38,0)) as long)"
    )
    est = F.when(
        F.col("n_kept") < int(k), F.col("n_kept").cast("long")
    ).otherwise(F.expr(_est_expr.format(kth="kth")))
    g_est = stats.select(
        "grp", "n_kept", "kth", est.alias("est_distinct"),
        F.when(F.col("n_kept") < int(k), space)
        .otherwise(F.col("kth"))
        .alias("theta"),
    )
    pairs = (
        g_est.select(
            F.col("grp").alias("type_a"),
            F.col("est_distinct").alias("est_a"),
            F.col("theta").alias("theta_a"),
        )
        .join(
            g_est.select(
                F.col("grp").alias("type_b"),
                F.col("est_distinct").alias("est_b"),
                F.col("theta").alias("theta_b"),
            ),
            F.col("type_a") < F.col("type_b"),
        )
    )
    # union sketch per pair: k smallest of the merged distinct hash sets
    a = sk.select(F.col("grp").alias("type_a"), "h")
    b = sk.select(F.col("grp").alias("type_b"), "h")
    merged = (
        a.join(pairs.select("type_a", "type_b"), "type_a")
        .select("type_a", "type_b", "h")
        .unionAll(
            b.join(pairs.select("type_a", "type_b"), "type_b")
            .select("type_a", "type_b", "h")
        )
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy(F.asc("h"))
    u = (
        merged.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= int(k))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("u_kept"), F.max("h").alias("u_kth"))
    )
    # intersection: common hashes below the smaller theta
    common = (
        a.join(b, "h")
        .join(pairs.select("type_a", "type_b", "theta_a", "theta_b"),
              ["type_a", "type_b"])
        .filter(F.col("h") < F.least("theta_a", "theta_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("x_common"))
    )
    est_u = F.when(
        F.col("u_kept") < int(k), F.col("u_kept").cast("long")
    ).otherwise(F.expr(_est_expr.format(kth="u_kth")))
    est_i = F.expr(
        "cast((cast(x_common as decimal(38,0))"
        f" * cast({KMV_HASH_SPACE} as decimal(38,0)))"
        " div cast(least(theta_a, theta_b) as decimal(38,0)) as long)"
    )
    return (
        pairs.join(u, ["type_a", "type_b"])
        .join(common, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            est_u.alias("est_union"),
            F.coalesce(est_i, F.lit(0)).cast("long").alias("est_intersect"),
        )
    )


def kmv_merge(sk_a: DataFrame, sk_b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge two KMV sketches (same group key): k smallest of the combined
    hash sets — the property that makes KMV a real distributed sketch:
    per-partition sketches merge to EXACTLY the sketch of the union
    (tested as such), so partial aggregation / micro-batch accumulation
    never changes the estimate."""
    merged = sk_a.select("grp", "h").unionAll(sk_b.select("grp", "h")).distinct()
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("grp", "h", "rn")
    )


# ---------------------------------------------------------------------------
# Portable Count-Min Sketch (Cormode & Muthukrishnan 2005) as plain
# DataFrame ops.
#
# The built-in `count_min_sketch` aggregate above is the native fast path,
# but its serialized register state is engine-internal (another engine
# cannot rebuild or cross-check it) and probing it requires collecting the
# candidate keys to the driver. This twin builds the depth x width counter
# grid as a DataFrame from the repo's portable md5-60 hash family, so
#   - the counter table IS the sketch: <= depth*width rows of
#     (d, cell, cnt), mergeable across any partitioning by summing cnt;
#   - probing is a JOIN against the (broadcast) counter table — fully
#     distributed, no driver collect, no candidate cap needed;
#   - the DuckDB oracle reproduces counters AND estimates bit-for-bit
#     (integer arithmetic throughout).
#
# 100 TB posture: one scan (the depth-fold explode is absorbed by map-side
# partial aggregation — each task emits at most depth*width partial rows),
# then a depth*width-row shuffle; the probe side touches only candidates.
# ---------------------------------------------------------------------------

CMS_PORT_DEPTH = 4
CMS_PORT_WIDTH = 2048


def _cms_cell(col: str, d_col: str = "d", width: int = CMS_PORT_WIDTH):
    """Portable CMS cell index: md5_60('cms<d>|<value>') mod width — an
    independent-per-row hash family keyed by the depth index."""
    return F.pmod(
        hashing.md5_long(
            F.concat(
                F.lit("cms"),
                F.col(d_col).cast("string"),
                F.lit("|"),
                F.col(col).cast("string"),
            )
        ),
        F.lit(width),
    )


def cms_portable_counters(
    df: DataFrame,
    col: str,
    depth: int = CMS_PORT_DEPTH,
    width: int = CMS_PORT_WIDTH,
) -> DataFrame:
    """One-pass mergeable portable CMS of ``col`` as a counter DataFrame
    (d, cell, cnt) — at most depth*width rows regardless of input size."""
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(col),
            F.explode(
                F.sequence(F.lit(0), F.lit(int(depth - 1)))
            ).alias("d"),
        )
        .select("d", _cms_cell(col, width=width).alias("cell"))
    )
    return rows.groupBy("d", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_portable_heavy_hitters(
    facts: DataFrame,
    candidates: DataFrame,
    col: str,
    depth: int = CMS_PORT_DEPTH,
    width: int = CMS_PORT_WIDTH,
) -> DataFrame:
    """Estimated total occurrence count in ``facts`` for every key in
    ``candidates[col]`` — the distributed twin of
    :func:`heavy_hitters_over_candidates`: the probe is a broadcast join
    of the counter table (<= depth*width rows), so the candidate set may
    be any size, not just driver-sized. est = min over depth rows of the
    hashed cell's counter (missing cell => 0); est >= true always, and
    est <= true + eps*N with eps ~ e/width per the classic analysis."""
    counters = cms_portable_counters(facts, col, depth, width)
    probes = (
        candidates.select(col)
        .filter(F.col(col).isNotNull())
        .distinct()
        .select(
            F.col(col),
            F.explode(
                F.sequence(F.lit(0), F.lit(int(depth - 1)))
            ).alias("d"),
        )
        .select(F.col(col), "d", _cms_cell(col, width=width).alias("cell"))
    )
    return (
        probes.join(F.broadcast(counters), ["d", "cell"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
        .orderBy(F.desc("est_count"), F.asc(col))
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter — the membership member of the sketch family
# (CMS = counts, HLL = cardinality, KMV = set ops, histogram = quantiles,
# Bloom = membership). Same portability contract as the rest: every bit
# position is a pure md5 function of the value, so a DuckDB oracle
# reproduces the filter AND every probe verdict exactly. One-sided error
# by construction: a key that was inserted is ALWAYS maybe-present;
# definitely-absent verdicts are certain. At 100 TB the bit table is the
# write-time materialization (<= m rows however large the build side)
# and probes are a broadcast join — the classic "skip the expensive
# lookup for keys we have never seen" gate in front of a join or a KV
# fetch.
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16  # bits — legacy explicit dial; see bloom_params
BLOOM_K = 5        # hash functions ~ (m/n) ln 2 at n ~ 9k build keys
BLOOM_BITS_PER_KEY = 8  # self-sizing target: m = next pow2 >= 8n
# ln(2) in parts-per-million — k is derived with INTEGER arithmetic only
# ((m * 693147) // (n * 1000000)) so the Spark side and the DuckDB oracle
# land on the identical k with zero float-rounding risk
_LN2_PPM = 693_147


def bloom_params(df: DataFrame, col: str) -> tuple[int, int]:
    """Self-sizing Bloom dimensions from the build side — the same
    eliminate-the-manual-knob move as similarity.balanced_planes /
    balanced_max_cells (the round-5 fixed (m, k) held the analytic
    false-positive bound only near the ~9k-key corpus it was sized for).

    m = the smallest power of two >= BLOOM_BITS_PER_KEY * n (n = exact
    distinct non-null build keys — one count job, the price of the
    portable-oracle contract), so the occupancy ratio n/m stays in
    [1/16, 1/8) at ANY corpus size and the false-positive rate is bounded
    by (1 - e^(-k n / m))^k ~ 3% worst-case within the band. k is the
    optimal (m/n) ln 2 rounded down, computed in integer ppm arithmetic
    so the DuckDB twin reproduces it exactly. Empty build side degrades
    to (64, 1) — a 64-bit always-miss filter."""
    n = df.filter(F.col(col).isNotNull()).select(col).distinct().count()
    if n == 0:
        return 64, 1
    m = 1 << max(6, (BLOOM_BITS_PER_KEY * n - 1).bit_length())
    k = max(1, (m * _LN2_PPM) // (n * 1_000_000))
    return m, k


def _bloom_bit(col: str, j_col: str = "j", m: int = BLOOM_M):
    """Bit index j of ``col``: md5_60('bloom|<j>|<value>') mod m — the
    depth-keyed family, same construction as the portable CMS cell. The
    depth key is delimited on BOTH sides: 'bloom<j>|<value>' would make
    (j=1, value='2|x') and (j=12, value='x') collide for k > 10,
    weakening hash-family independence (round-5 ADVICE finding)."""
    return F.pmod(
        hashing.md5_long(
            F.concat(
                F.lit("bloom|"),
                F.col(j_col).cast("string"),
                F.lit("|"),
                F.col(col).cast("string"),
            )
        ),
        F.lit(int(m)),
    )


def bloom_bits(
    df: DataFrame, col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """One-pass mergeable Bloom build: the DISTINCT set bit positions of
    every non-null ``col`` value under ``k`` hash functions — at most
    ``m`` rows regardless of input size (map-side combine collapses
    duplicates before the single narrow shuffle). Merging two filters is
    a distinct union of their bit tables (same OR the flat bitmap form
    would compute)."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(col),
            F.explode(F.sequence(F.lit(0), F.lit(int(k - 1)))).alias("j"),
        )
        .select(_bloom_bit(col, m=m).alias("bit"))
        .distinct()
    )


def bloom_merge(bits_a: DataFrame, bits_b: DataFrame) -> DataFrame:
    """OR of two filters built with the same (k, m): union-distinct of
    the set-bit tables."""
    return bits_a.unionByName(bits_b).distinct()


def bloom_membership(
    bits: DataFrame,
    probes: DataFrame,
    col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Per-probe membership verdict against a built filter:
    ``maybe_present`` iff ALL ``k`` bit positions are set. The probe is a
    broadcast left join of the bit table (<= m rows), so the probe side
    may be any size. Inserted keys are always maybe_present (no false
    negatives); absent keys are maybe_present with probability
    ~ (1 - e^(-k n / m))^k."""
    pj = (
        probes.select(col)
        .filter(F.col(col).isNotNull())
        .distinct()
        .select(
            F.col(col),
            F.explode(F.sequence(F.lit(0), F.lit(int(k - 1)))).alias("j"),
        )
        .select(F.col(col), _bloom_bit(col, m=m).alias("bit"))
    )
    hits = pj.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return hits.groupBy(col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k).alias(
            "maybe_present"
        )
    )


# ---------------------------------------------------------------------------
# Spark-native approximate aggregates — the engine-internal fast paths.
#
# These are the plans a 100 TB run would prefer (HLL++ / GK sketches fully
# inside Tungsten, zero extra shuffle rows), kept as library functions with
# error-bound tests (tests/test_wh_sql.py). The REGISTRY twins
# (wh_approx_users / wh_approx_percentiles / wh_heavy_hitters) run the
# portable deterministic sketches above instead, because their estimates
# are reproducible by the DuckDB oracle — every registry query stays
# hash-checkable end-to-end.
# ---------------------------------------------------------------------------


def native_approx_users(events: DataFrame) -> DataFrame:
    """approx_count_distinct (HLL++) distinct users per event type."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


def native_approx_percentiles(events: DataFrame) -> DataFrame:
    """percentile_approx (Greenwald-Khanna, accuracy 10000) p50/p90 of
    value per event type."""
    return events.groupBy("event_type").agg(
        F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        ),
        F.percentile_approx(F.col("value"), F.lit(0.9), F.lit(10000)).alias(
            "p90_approx"
        ),
    )

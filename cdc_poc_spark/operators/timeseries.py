"""Time-series subsequence similarity search over the ``events`` stream —
find the per-user sliding windows of the value series nearest a query
pattern (z-normalized Euclidean distance, the UCR-suite formulation used by
the distributed trajectory/series-search literature in PAPERS.md: EDBT 2019
streaming series similarity, ICDE 2021 REPOSE).

The reference has no series search (its read path is key lookups,
reference sinks/RedisSink.java:174-231); this is an M6-class extension
built Spark-first:

- sliding windows come from ONE window spec per user (`collect_list` over
  `rowsBetween`) — a single hash shuffle on user_id, then every candidate
  subsequence materializes inside the partition, no self-join;
- z-normalization and the distance are fixed-order array folds (same IEEE
  op order as the DuckDB oracle's ``list_reduce`` — bit-identical);
- top-k is orderBy+limit -> TakeOrderedAndProject (per-partition heaps).

Scale: cost = one shuffle of (user_id, ts, value) + O(W) arithmetic per
row. W is a constant; at 100 TB this is the same shape as any windowed
aggregation. Constant (zero-variance) windows are skipped, as z-distance
is undefined there.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SUBSEQ_W = 8
SUBSEQ_K = 20
# query shape: a monotone ramp (z-normalized below) — "find value runs that
# steadily increase"
_RAW_PATTERN = [float(i) for i in range(SUBSEQ_W)]


def znorm_pattern(raw: list[float] | None = None) -> list[float]:
    raw = raw if raw is not None else _RAW_PATTERN
    m = sum(raw) / len(raw)
    sd = math.sqrt(sum((x - m) ** 2 for x in raw) / len(raw))
    return [(x - m) / sd for x in raw]


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def subsequence_topk(
    events: DataFrame, k: int = SUBSEQ_K, w: int = SUBSEQ_W
) -> DataFrame:
    """Top-k (user_id, event_id) windows by z-normalized Euclidean distance
    of the trailing-w value subsequence to the query pattern.

    Output: (user_id, event_id, dist) — dist rounded to 6 decimals in the
    output; ranking uses the raw double with (user_id, event_id) tiebreak.
    """
    pat = znorm_pattern()
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(w - 1), 0)
    )
    sub = events.select(
        "user_id",
        "event_id",
        F.collect_list(F.col("value").cast("double")).over(win).alias("sub"),
    ).filter(F.size("sub") == w)
    n = F.lit(float(w))
    mean = (_fold_sum(F.col("sub")) / n).alias("m")
    with_m = sub.select("user_id", "event_id", "sub", mean)
    sd = F.sqrt(
        _fold_sum(
            F.transform(
                F.col("sub"), lambda x: (x - F.col("m")) * (x - F.col("m"))
            )
        )
        / n
    ).alias("sd")
    with_sd = with_m.select("user_id", "event_id", "sub", "m", sd).filter(
        F.col("sd") > 0
    )
    pat_col = F.array(*[F.lit(p) for p in pat])
    dist = F.sqrt(
        _fold_sum(
            F.zip_with(
                F.col("sub"),
                pat_col,
                lambda x, q: ((x - F.col("m")) / F.col("sd") - q)
                * ((x - F.col("m")) / F.col("sd") - q),
            )
        )
    )
    return (
        with_sd.select("user_id", "event_id", dist.alias("_d"))
        .orderBy(F.asc("_d"), F.asc("user_id"), F.asc("event_id"))
        .limit(k)
        .select("user_id", "event_id", F.round(F.col("_d"), 6).alias("dist"))
    )


AUTOCORR_LAGS = (1, 2, 3, 5, 10)


def autocorrelation(events: DataFrame, lags: tuple[int, ...] = AUTOCORR_LAGS) -> DataFrame:
    """Lag-k autocorrelation of the per-minute value series, per event type
    — the seasonality/self-similarity diagnostic run before forecasting or
    anomaly thresholds are chosen.

    Determinism design: a floating-point ``corr`` aggregate is
    partition-order dependent (different runs of the SAME engine can
    disagree in the last ulp), so Pearson's r is assembled from EXACT
    decimal sums instead — minute totals are DECIMAL(18,2); the five
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in decimal
    (exact, order-independent), and only the final r is computed in double.
    Shape: one minute aggregate, one self-join per lag on (type, minute+L)
    — both shuffles on the same key family; at 100 TB the minute series is
    ~5 orders of magnitude smaller than the events scanned once."""
    from ..functions.timeutil import ntz_trunc

    minutes = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type"),
            ntz_trunc("minute", F.col("ts")).alias("minute"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    # explicit partition count on the probe side of each lag join: the
    # minute aggregate is byte-tiny, so AQE coalesces it onto 1-2
    # partitions and the five lag joins + decimal products would run
    # nearly serially (same guard as robust_trend's pair join)
    par = events.sparkSession.sparkContext.defaultParallelism
    lagged = None
    for lag in lags:
        a = minutes.select(
            "event_type",
            F.col("minute").alias("m"),
            F.col("v").alias("x"),
        ).repartition(par, "event_type", "m")
        b = minutes.select(
            "event_type",
            (F.col("minute") - F.expr(f"INTERVAL {int(lag)} MINUTES")).alias("m"),
            F.col("v").alias("y"),
        )
        pairs = a.join(b, ["event_type", "m"]).select(
            "event_type",
            F.lit(int(lag)).alias("lag"),
            F.col("x"),
            F.col("y"),
            (F.col("x") * F.col("y")).alias("xy"),
            (F.col("x") * F.col("x")).alias("xx"),
            (F.col("y") * F.col("y")).alias("yy"),
        )
        lagged = pairs if lagged is None else lagged.unionAll(pairs)
    stats = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
        F.sum("yy").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / n
    den = F.sqrt(
        (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n)
        * (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n)
    )
    # zero-variance series (or single-pair groups) have den == 0: r is
    # undefined there -> NULL, identically on both engines
    safe_den = F.when(den != 0.0, den)
    return stats.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        (F.round(num / safe_den, 6) + F.lit(0.0)).alias("autocorr"),
    )


# ---------------------------------------------------------------------------
# Event-rate anomaly detection: trailing-window z-score spikes/drops.
# ---------------------------------------------------------------------------

ANOM_WINDOW = 60  # trailing history length in minute-buckets
ANOM_MIN_N = 30  # minimum history before a bucket is scored
ANOM_Z = 3  # threshold in sigmas (integer so z^2 stays exact)


def rate_anomalies(
    events: DataFrame,
    window: int = ANOM_WINDOW,
    min_n: int = ANOM_MIN_N,
    z: int = ANOM_Z,
) -> DataFrame:
    """Per-event-type rate anomalies: minute buckets whose event count sits
    more than ``z`` trailing standard deviations from the trailing mean
    (the ops alarm a streaming ingest pipeline pages on).

    Determinism design: the anomaly DECISION is pure integer arithmetic —
    with trailing sums n, s = Σcnt, ss = Σcnt² (all BIGINT-exact), the test
    (x-μ)²/σ² > z² rearranges to

        (n·x - s)²  >  z² · (n·ss - s²)

    so the flagged row set is bit-identical in Spark and DuckDB regardless
    of float behavior; the reported z_score is the only double (and it is
    derived from those same exact integers, then rounded). A constant
    history (variance 0) flags any deviation.

    Shape: one groupBy shuffle events→(type, minute) — after which the
    frame is ~5 orders of magnitude smaller than the fact table — then one
    re-shuffle on type for the trailing window. Integer-overflow bound:
    exact up to ~3.9e8 events per (type, minute); above that, pre-aggregate
    to coarser buckets.
    """
    return score_minute_counts(
        minute_counts(events), window=window, min_n=min_n, z=z
    )


def minute_counts(events: DataFrame) -> DataFrame:
    """(event_type, minute, cnt) — the mergeable substrate of
    :func:`rate_anomalies`: per-minute counts ADD across batches, so a
    streaming ingest can maintain them incrementally (sum-merge per
    micro-batch) and score with :func:`score_minute_counts` at any point."""
    from ..functions.timeutil import ntz_trunc

    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type", ntz_trunc("minute", F.col("ts")).alias("minute")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def score_minute_counts(
    minutes: DataFrame,
    window: int = ANOM_WINDOW,
    min_n: int = ANOM_MIN_N,
    z: int = ANOM_Z,
) -> DataFrame:
    """Scoring half of :func:`rate_anomalies` over a pre-built (and
    possibly stream-merged) minute-count frame."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(-window, -1)
    )
    scored = minutes.select(
        "event_type",
        "minute",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    )
    num = F.col("n") * F.col("cnt") - F.col("s")  # n * (x - mean)
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")  # n^2 * var
    is_anom = (F.col("n") >= min_n) & (
        F.when(var_n2 == 0, num != 0).otherwise(
            num * num > F.lit(z * z) * var_n2
        )
    )
    return (
        scored.filter(is_anom)
        .select(
            "event_type",
            "minute",
            "cnt",
            F.col("n").cast("long").alias("trailing_n"),
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), 4
            ).alias("trailing_mean"),
            F.when(
                var_n2 > 0,
                F.round(
                    num.cast("double") / F.sqrt(var_n2.cast("double")), 4
                ),
            ).alias("z_score"),
        )
        .orderBy("event_type", "minute")
    )


def trend_lines(events: DataFrame) -> DataFrame:
    """Per-type OLS trend of the minute value series — slope (value units
    per minute), intercept, and r² — the trend-detection step between the
    autocorrelation diagnostic and forecasting.

    Same determinism design as :func:`autocorrelation`: a float
    regression aggregate is partition-order dependent, so the five
    sufficient statistics accumulate EXACTLY (x is integer minutes since
    the group's first minute — tz-free calendar arithmetic, never
    unix_*/epoch on NTZ; y totals are DECIMAL(18,2)), and only the final
    slope/intercept/r² are computed in double, in the same expression
    order as the SQL twin. Zero-variance groups emit NULLs identically.

    Shape: one minute rollup, a per-type window min for the time origin,
    one tiny per-type aggregate."""
    from pyspark.sql import Window as W

    from ..functions.timeutil import ntz_trunc

    minutes = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type"),
            ntz_trunc("minute", F.col("ts")).alias("minute"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    m0 = F.min("minute").over(W.partitionBy("event_type"))
    t = minutes.withColumn("m0", m0).select(
        "event_type",
        F.expr("timestampdiff(MINUTE, m0, minute)").cast("long").alias("x"),
        "v",
    )
    s = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("v")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    sxy_d = F.col("sxy").cast("double")
    sxx_d = F.col("sxx").cast("double")
    syy_d = F.col("syy").cast("double")
    num = n_d * sxy_d - sx_d * sy_d
    den = n_d * sxx_d - sx_d * sx_d
    den_y = n_d * syy_d - sy_d * sy_d
    slope_raw = num / F.when(den != 0.0, den)
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_minutes"),
        (F.round(slope_raw, 6) + F.lit(0.0)).alias("slope_per_minute"),
        (F.round((sy_d - slope_raw * sx_d) / n_d, 6) + F.lit(0.0)).alias(
            "intercept"
        ),
        (
            F.round(
                (num * num) / F.when(den * den_y != 0.0, den * den_y), 6
            )
            + F.lit(0.0)
        ).alias("r2"),
    )


ROBUST_MAX_GAP = 30  # bounded-gap pair window, minutes


def robust_trend(events: DataFrame, max_gap: int = ROBUST_MAX_GAP) -> DataFrame:
    """Bounded-gap Theil–Sen robust slope of the minute value series per
    type — the outlier-resistant complement to :func:`trend_lines`'s OLS
    (a single corrupted minute can move an OLS slope arbitrarily; a
    median of pairwise slopes has a ~29% breakdown point).

    The pair space is BOUNDED: slopes come from minute pairs at gaps
    1..``max_gap`` (one equi-join per gap on (type, minute + g), the
    autocorrelation join shape) — classic all-pairs Theil-Sen is
    O(series²) slopes whose exact median buffers every value per group
    (the first cut OOM'd a default-heap session at a 2k-minute series and
    would be 1B pairs at sf0.1); the bounded variant is O(series x gap),
    the standard windowed robustification, and keeps the exact percentile
    buffer trivially small.

    Determinism: every slope is the same double expression in both
    engines over exact DECIMAL minute totals; the median interpolates an
    identical multiset (the wh_percentiles discipline), rounded 6dp."""
    from ..functions.timeutil import ntz_trunc

    minutes = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type"),
            ntz_trunc("minute", F.col("ts")).alias("minute"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    a = minutes.select(
        "event_type",
        F.col("minute").alias("m_i"),
        F.col("v").alias("v_i"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_gap)))
        ).alias("g"),
    ).select(
        "event_type",
        "g",
        "v_i",
        (F.col("m_i") + F.col("g") * F.expr("INTERVAL 1 MINUTE")).alias("m_j"),
    )
    # explicit partition count on the exploded side: the minute aggregate
    # is a few hundred KB, so AQE coalesces its exchange onto 1-2
    # partitions — and the ×max_gap explode + join + slope arithmetic
    # (the CPU-dense part) would run nearly serially (the same
    # byte-blindness functions/partitioning.spread guards scans against;
    # measured 2.9s -> 1.9s at sf0.1, identical output). Explicit counts
    # are exempt from AQE coalescing.
    par = events.sparkSession.sparkContext.defaultParallelism
    a = a.repartition(par, "event_type", "m_j")
    b = minutes.select(
        "event_type", F.col("minute").alias("m_j"), F.col("v").alias("v_j")
    )
    pairs = a.join(b, ["event_type", "m_j"]).select(
        "event_type",
        (
            (F.col("v_j").cast("double") - F.col("v_i").cast("double"))
            / F.col("g").cast("double")
        ).alias("slope"),
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.percentile(F.col("slope"), F.lit(0.5)), 6).alias(
            "theil_sen_slope"
        ),
    )


def seasonal_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonal profile per event type: each hour bucket's
    mean value and its deviation from the type's overall mean — the
    seasonality fingerprint read before de-seasonalizing anomaly
    thresholds or forecasts (completes the series toolkit next to
    autocorrelation / OLS / Theil-Sen / z-score anomalies).

    Exactness: sums accumulate in DECIMAL (order-independent); the type
    total is the window sum of the 24 bucket sums (exact decimal), and
    only the final means/deviation divide in double, mirrored
    expression-for-expression. hour() on TIMESTAMP_NTZ is pure calendar
    arithmetic — tz-free in both engines."""
    from pyspark.sql import Window as W

    b = (
        events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    w = W.partitionBy("event_type")
    tot_n = F.sum("n_events").over(w)
    tot_v = F.sum("sv").over(w)
    avg_b = F.col("sv").cast("double") / F.col("n_events").cast("double")
    avg_t = tot_v.cast("double") / tot_n.cast("double")
    return b.select(
        "event_type",
        "hour_of_day",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(avg_b, 6).alias("avg_value"),
        F.round(avg_b - avg_t, 6).alias("deviation_from_type_mean"),
    )

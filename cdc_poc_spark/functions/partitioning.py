"""Scan-splitting guard for CPU-heavy per-row expression stages.

On a real cluster a 100 TB table scans as tens of thousands of splits and
every downstream expression runs wide; `spread` is a NO-OP there (the guard
sees enough partitions and returns the input unchanged — no shuffle of the
payload). The test corpora, however, are single small parquet files, which
would serialize JSON parsing / shingle hashing / LSH projection onto one
core of local[32]. In exactly that under-split case we pay one cheap
shuffle of the raw rows to unlock the other cores."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, col: str, out_col: str = "_r", n_buckets: int = 64
) -> DataFrame:
    """Zero-based global rank of a UNIQUE numeric key, without the
    single-partition exchange a bare ``Window.orderBy(col)`` costs.

    Plan shape: order-preserving value-range bucketing (deterministic
    expressions over a broadcast min/max — no sampling, so the two uses of
    the bucketed frame below agree without a persist), per-bucket local
    ``row_number`` (parallel across buckets), then rank = bucket offset +
    local rank. The only ordered window runs over the ``n_buckets``-row
    offsets frame — constant-sized at any corpus scale. Skewed key values
    only unbalance buckets, never break ranks.

    Contract: ``col`` is numeric, non-null, and unique (ties would make
    ranks partition-dependent). The bucket expression runs in DOUBLE space
    (divide by the span before scaling by ``n_buckets``) so keys spanning
    the full int64 domain — e.g. 60-bit md5-range hashes — never overflow
    the ``(col - lo) * n_buckets`` intermediate; subtraction, division by a
    positive span, scaling, and floor are each monotone under IEEE-754
    rounding, so bucket assignment stays order-preserving."""
    stats = df.agg(F.min(col).alias("_lo"), F.max(col).alias("_hi"))
    span = (
        F.col("_hi").cast("double") - F.col("_lo").cast("double") + F.lit(1.0)
    )
    bucketed = df.join(F.broadcast(stats)).withColumn(
        "_bkt",
        F.least(
            F.floor(
                (F.col(col).cast("double") - F.col("_lo").cast("double"))
                / span
                * F.lit(float(n_buckets))
            ),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )
    local = bucketed.withColumn(
        "_lr", F.row_number().over(Window.partitionBy("_bkt").orderBy(col))
    )
    offsets = (
        local.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_off")
    )
    return local.join(F.broadcast(offsets), "_bkt").select(
        *df.columns,
        (F.col("_off") + F.col("_lr") - 1).cast("long").alias(out_col),
    )


def hash_distinct(df: DataFrame, *cols: str) -> DataFrame:
    """Deduplicate on ``cols`` over an EXPLICIT full-width hash layout.

    A bare ``.distinct()`` lets AQE size the dedup exchange by BYTES —
    and a candidate-pair frame is a few bytes per row while each
    surviving row funds an expensive verify downstream (a 64-dim cosine
    fold, a shingle array_intersect), so AQE coalesces the aggregate
    onto 1-2 partitions and the dedup itself runs nearly serially: the
    same cost-blindness :func:`spread` guards scans against, at the
    shuffle instead. Measured at the sf1 spot-bench corpus (12.5M
    candidates from 20k vectors): ``embedding_dup_pairs_ivf`` end-to-end
    116.3s with ``.distinct()`` vs 18.3s with this layout — identical
    output. Explicit partition counts are exempt from AQE coalescing,
    and ``dropDuplicates`` over the repartition keys reuses the
    exchange, so the plan still carries exactly ONE shuffle for the
    dedup.

    Precondition: ``cols`` must cover EVERY column of ``df`` — this is a
    ``.distinct()`` replacement, not a keep-one-per-key operator. On a
    wider frame ``dropDuplicates`` would keep one arbitrary row per key
    and silently change semantics, so that call shape is rejected."""
    if set(cols) != set(df.columns):
        raise ValueError(
            "hash_distinct replaces .distinct(): cols must equal df.columns "
            f"(got {sorted(cols)} vs {sorted(df.columns)}); "
            "pre-project the frame or use dropDuplicates explicitly"
        )
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *cols).dropDuplicates(list(cols))


def spread(df: DataFrame, *keys: str, min_tasks: int = 8) -> DataFrame:
    """Repartition `df` across cores ONLY when its scan is under-split.

    Repartition by `keys` keeps a deterministic hash layout (so an equi-join
    or groupBy on the same key downstream can reuse the exchange); with no
    keys, round-robin. The partition count is EXPLICIT: a bare
    repartition(col) is subject to AQE coalescing, which would fold this
    small-but-CPU-dense shuffle right back onto a couple of cores (AQE sizes
    by bytes, not by expression cost)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(parallelism, min_tasks):
        return df
    return df.repartition(parallelism, *keys) if keys else df.repartition(parallelism)

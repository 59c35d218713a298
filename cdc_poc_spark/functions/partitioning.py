"""Scan-splitting guard for CPU-heavy per-row expression stages.

On a real cluster a 100 TB table scans as tens of thousands of splits and
every downstream expression runs wide; `spread` is a NO-OP there (the guard
sees enough partitions and returns the input unchanged — no shuffle of the
payload). The test corpora, however, are single small parquet files, which
would serialize JSON parsing / shingle hashing / LSH projection onto one
core of local[32]. In exactly that under-split case we pay one cheap
shuffle of the raw rows to unlock the other cores."""

from __future__ import annotations

from pyspark.sql import DataFrame


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

"""Z-order (Morton-curve) multi-dimensional clustering for the warehouse.

Single-key `sortWithinPartitions` (write_warehouse's BigQuery-clustering
analog) makes parquet min/max stats selective for the FIRST key only: a
file sorted by `l_partkey` spans the full `l_suppkey` domain, so a
predicate on the second key prunes nothing. Z-ordering interleaves the
bits of several keys into one sort value, so every file covers a small
hyper-rectangle of the key space and min/max stats prune on EVERY
clustered dimension — the layout trick behind Delta/Iceberg `ZORDER BY`
and BigQuery multi-column clustering, built here from plain Catalyst
expressions (width_bucket + shift/or), no UDFs, fully codegen'd.

Scale posture: the only global pass is one min/max aggregate per clustered
column (a single 1-row collect); bucketization + bit interleave are narrow
per-row expressions, and the final exchange is the same repartitionByRange
any sorted write needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZVAL_COL = "_zval"
DEFAULT_BITS = 16


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton code: bit i of column c lands at position i*ncols + c."""
    ncols = len(buckets)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for c, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * ncols + c))
    return out


def with_zvalue(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> DataFrame:
    """Append `_zval`: the Morton interleave of each column's
    width_bucket rank over its observed [min, max] range.

    `bits` per dimension; len(cols) * bits must fit a long (<= 63).
    NULLs rank lowest (bucket 0). Non-numeric orderable types (timestamps,
    dates) are ranked via their double cast.
    """
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must be <= 63")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).first()
    n_buckets = 1 << bits
    buckets = []
    for c in cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0).cast("long"))
            continue
        # width_bucket is 1..n+1 on [lo, hi]; clamp into 0..n-1
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
        buckets.append(
            F.coalesce(
                F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_buckets - 1)),
                F.lit(0),
            ).cast("long")
        )
    return df.withColumn(ZVAL_COL, _interleave(buckets, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet z-ordered on `cols`: range-partition on the
    Morton value (one writer per output file, balanced by sampling) and
    sort within each partition so row groups inside a file are tight too."""
    out = with_zvalue(df, cols, bits)
    (
        out.repartitionByRange(n_files, F.col(ZVAL_COL))
        .sortWithinPartitions(ZVAL_COL)
        .drop(ZVAL_COL)
        .write.mode(mode)
        .parquet(path)
    )

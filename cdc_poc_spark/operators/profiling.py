"""Single-pass data profiling — the ingest-gate quality check a large-scale
training-data pipeline runs before anything else touches a new drop.

Not present in the reference (its only data validation is eyeballing Redis
keys, reference README.md:221-236); included as an M6-class pipeline
extension (SURVEY §7.3).

Scale shape: ALL metrics for ALL profiled columns come from ONE ``agg`` over
one scan — count/nulls/min/max are plain map-side-partial aggregates, and
the per-column distinct counts ride the same pass (Catalyst plans multi
count_distinct via a single Expand + partial aggregation, one shuffle
total). The wide 1-row result is then exploded to long format
(column, metric rows) driver-free via a literal map + explode, never a
per-column job loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metric names, in output order
METRICS = ("n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all non-complex columns) into long rows
    ``(column, n_rows, n_nulls, n_distinct, min_str, max_str)``.

    min/max are compared in the column's native type (so numerics order
    numerically) and rendered as strings only for the uniform output schema.
    """
    if columns is None:
        columns = [
            f.name
            for f in df.schema
            if f.dataType.typeName() not in ("array", "map", "struct", "binary")
        ]
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_nulls"),
            F.count_distinct(col).alias(f"{c}__n_distinct"),
            F.min(col).cast("string").alias(f"{c}__min_str"),
            F.max(col).cast("string").alias(f"{c}__max_str"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_nulls").alias("n_nulls"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_str").alias("min_str"),
                F.col(f"{c}__max_str").alias("max_str"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


__all__ = ["profile", "METRICS"]


def profile_vectors(embeddings: DataFrame) -> DataFrame:
    """Single-pass profile of a vector column — the embedding-table ingest
    gate (dimension drift, NaN poisoning, zero vectors and norm range all
    break ANN indexes silently). One aggregate over one scan; norms are the
    same sequential-fold dot as the similarity operators, summed in DECIMAL
    for partition-order-independent totals."""
    emb = F.col("embedding")
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(emb, emb, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    has_nan = F.exists(emb, lambda x: F.isnan(x.cast("double")))
    return embeddings.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(emb.isNull(), 1).otherwise(0)).cast("long").alias("n_null_vec"),
        F.min(F.size(emb)).cast("long").alias("dim_min"),
        F.max(F.size(emb)).cast("long").alias("dim_max"),
        F.sum(F.when(has_nan, 1).otherwise(0)).cast("long").alias("n_nan_vec"),
        F.sum(F.when(norm == 0.0, 1).otherwise(0)).cast("long").alias("n_zero_norm"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
        F.sum(norm.cast("decimal(25,6)")).cast("double").alias("sum_norm"),
    )


def profile_drift(
    old: DataFrame, new: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Per-column drift report between two snapshots of the same table —
    the observability step between `profile` (one snapshot's gate) and
    `snapshot_diff` (row-level delta): both snapshots are profiled with
    the same single-pass aggregate, joined on column name, and the report
    emits exact integer deltas plus a range-change flag. A schema-stable
    upstream that suddenly doubles null counts or collapses distinct
    values fails THIS check long before row-level diffs are affordable.

    All outputs are exact integers / booleans (no ratios), so the report
    is deterministic across engines and partitionings.

    Output: (column, rows_old, rows_new, nulls_old, nulls_new,
    distinct_old, distinct_new, distinct_delta, range_changed)."""
    po = profile(old, columns).select(
        "column",
        F.col("n_rows").alias("rows_old"),
        F.col("n_nulls").alias("nulls_old"),
        F.col("n_distinct").alias("distinct_old"),
        F.col("min_str").alias("_min_o"),
        F.col("max_str").alias("_max_o"),
    )
    pn = profile(new, columns).select(
        "column",
        F.col("n_rows").alias("rows_new"),
        F.col("n_nulls").alias("nulls_new"),
        F.col("n_distinct").alias("distinct_new"),
        F.col("min_str").alias("_min_n"),
        F.col("max_str").alias("_max_n"),
    )
    return po.join(pn, "column").select(
        "column",
        "rows_old",
        "rows_new",
        "nulls_old",
        "nulls_new",
        "distinct_old",
        "distinct_new",
        (F.col("distinct_new") - F.col("distinct_old")).alias("distinct_delta"),
        (
            ~F.col("_min_o").eqNullSafe(F.col("_min_n"))
            | ~F.col("_max_o").eqNullSafe(F.col("_max_n"))
        ).alias("range_changed"),
    )

"""Z-order layout tests: the point is the FILE-LEVEL stats, so the
assertions measure what min/max pruning would actually skip.

With a single-key sort, every file spans ~the full domain of the second
key (zero pruning for predicates on it). Z-ordering must shrink the
per-file extent on EVERY clustered dimension.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.functions.zorder import ZVAL_COL, with_zvalue, write_zordered
from cdc_poc_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 8


def _per_file_extents(spark, path, xcol, ycol):
    """Mean normalized [min,max] width per file for both columns."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    rng = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).first()
    x_dom = float(rng[1] - rng[0]) or 1.0
    y_dom = float(rng[3] - rng[2]) or 1.0
    per_file = (
        df.groupBy("_f")
        .agg(
            (F.max(xcol) - F.min(xcol)).alias("xw"),
            (F.max(ycol) - F.min(ycol)).alias("yw"),
        )
        .collect()
    )
    assert len(per_file) == N_FILES
    mean_x = sum(float(r["xw"]) for r in per_file) / len(per_file) / x_dom
    mean_y = sum(float(r["yw"]) for r in per_file) / len(per_file) / y_dom
    return mean_x, mean_y


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sorted_path = str(tmp_path / "sorted")
    z_path = str(tmp_path / "zorder")
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    write_zordered(li, z_path, ["l_partkey", "l_suppkey"], n_files=N_FILES)

    sx, sy = _per_file_extents(spark, sorted_path, "l_partkey", "l_suppkey")
    zx, zy = _per_file_extents(spark, z_path, "l_partkey", "l_suppkey")
    # single-key sort: tight on the sort key, useless on the other
    assert sx < 0.35
    assert sy > 0.9
    # z-order: BOTH dimensions materially tighter than the full domain
    assert zx < 0.75
    assert zy < 0.75
    # and the second key improves by a wide margin over the sorted layout
    assert zy < sy * 0.8


def test_zvalue_is_narrow_codegen_expression(spark):
    """The Morton value must be pure Catalyst (no Python, no shuffle before
    the final range exchange) so it rides the scan's codegen stage."""
    li = load_table(spark, SF_DIR, "lineitem")
    plan = (
        with_zvalue(li, ["l_partkey", "l_suppkey"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_zvalue_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5), (1, 5), (2, 5)], "a int, b int"
    )
    out = with_zvalue(df, ["a", "b"]).collect()
    # constant column b -> bucket 0 everywhere; null a -> bucket 0
    vals = {r[ZVAL_COL] for r in out}
    assert all(v is not None and v >= 0 for v in vals)

"""Equi-width histogram quantile sketch (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators import sketches


def _vals(spark, n, parts=4):
    return spark.range(0, n, 1, parts).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("x"),
    )


def test_merge_equals_global(spark):
    """Per-group registers summed by bin must equal the whole-table
    histogram — the shared global grid is what makes that true."""
    df = _vals(spark, 10_000)
    merged = (
        sketches.hist_registers(df, "x", group_cols=["g"])
        .groupBy("bin", "lo", "width")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketches.hist_registers(df, "x")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_quantiles_on_uniform_within_bin_width(spark):
    n = 100_000
    df = _vals(spark, n)
    out = {r.quantile: r for r in
           sketches.hist_quantiles(sketches.hist_registers(df, "x")).collect()}
    width = (n - 1) / sketches.HIST_BINS
    for q, r in out.items():
        assert abs(r.est_value - q * n) <= width + 1, (q, r.est_value)
        assert r.n_rows == n


def test_partition_independent(spark):
    a = sketches.hist_quantiles(
        sketches.hist_registers(_vals(spark, 5000, parts=1), "x")
    ).collect()
    b = sketches.hist_quantiles(
        sketches.hist_registers(_vals(spark, 5000, parts=32), "x")
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_constant_column(spark):
    df = spark.range(100).select(F.lit(7.5).alias("x"))
    out = sketches.hist_quantiles(sketches.hist_registers(df, "x")).collect()
    assert all(r.est_value == 7.5 for r in out)


def test_bin_range(spark):
    regs = sketches.hist_registers(_vals(spark, 3000), "x").collect()
    assert all(0 <= r.bin < sketches.HIST_BINS for r in regs)
    assert sum(r.cnt for r in regs) == 3000


def test_value_report_scopes(spark, sf_dir):
    from cdc_poc_spark.sources.testdata import load_table

    rep = sketches.hist_value_report(load_table(spark, sf_dir, "events"))
    rows = rep.collect()
    scopes = {r.scope for r in rows}
    assert "ALL" in scopes
    for r in rows:
        assert r.n_rows > 0
    # quantile estimates are monotone within each scope
    for s in scopes:
        ests = [r.est_value for r in sorted(
            (x for x in rows if x.scope == s), key=lambda x: x.quantile)]
        assert ests == sorted(ests)

"""k-anonymity audit (operators/privacy.py::k_anonymity_histogram)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators.privacy import k_anonymity_histogram


def test_histogram_counts_and_flags(spark):
    # classes: (a,1)x3, (a,2)x1, (b,1)x1, (b,2)x5
    df = spark.createDataFrame(
        [("a", 1)] * 3 + [("a", 2)] + [("b", 1)] + [("b", 2)] * 5,
        "seg string, band int",
    )
    rows = {r.class_size: r for r in
            k_anonymity_histogram(df, ["seg", "band"], k=5).collect()}
    assert rows[1].n_classes == 2 and rows[1].n_rows == 2
    assert rows[3].n_classes == 1 and rows[3].n_rows == 3
    assert rows[5].n_classes == 1 and rows[5].n_rows == 5
    assert rows[1].below_k == 1 and rows[3].below_k == 1
    assert rows[5].below_k == 0
    # row conservation: every input row is in exactly one class
    assert sum(r.n_rows for r in rows.values()) == df.count()


def test_fully_anonymous_table(spark):
    df = spark.createDataFrame([("x",)] * 10, "seg string")
    rows = k_anonymity_histogram(df, ["seg"], k=5).collect()
    assert len(rows) == 1
    assert rows[0].class_size == 10 and rows[0].below_k == 0


def test_expression_qi_columns(spark, sf_dir):
    from cdc_poc_spark.sources.testdata import load_table

    cust = load_table(spark, sf_dir, "customer")
    hist = k_anonymity_histogram(
        cust,
        [
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
        ],
    ).collect()
    assert sum(r.n_rows for r in hist) == cust.count()
    assert all(r.below_k == (1 if r.class_size < 5 else 0) for r in hist)

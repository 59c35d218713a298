"""Data-quality constraint audit (operators/quality.py): semantics on
constructed violations, plus the single-scan plan claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators import quality


def _report_map(df):
    return {
        (r.table_name, r.constraint_name): r for r in df.collect()
    }


def test_audit_checks_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, "F", -5.0),   # bounds violation
            (None, "X", 20.0),  # completeness + domain violation
            (4, "P", None),   # bounds violation (NULL fails predicate)
        ],
        "k int, status string, price double",
    )
    rep = _report_map(
        quality.audit_checks(
            df,
            "t",
            [
                quality.Check("complete:k", F.col("k").isNotNull()),
                quality.Check("domain:status", F.col("status").isin("O", "F", "P")),
                quality.Check("bounds:price>0", F.col("price") > 0),
            ],
            unique_cols=[("k",)],
        )
    )
    c = rep[("t", "complete:k")]
    assert (c.metric_num, c.metric_den, c.passed) == (3, 4, 0)
    assert c.pct_ok == 75.0
    d = rep[("t", "domain:status")]
    assert (d.metric_num, d.passed) == (3, 0)
    b = rep[("t", "bounds:price>0")]
    assert (b.metric_num, b.passed) == (2, 0)
    u = rep[("t", "unique:k")]
    # count_distinct skips the NULL key: 3 distinct over 4 rows
    assert (u.metric_num, u.metric_den, u.passed) == (3, 4, 0)


def test_audit_checks_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    rep = _report_map(
        quality.audit_checks(
            df, "t", [quality.Check("complete:k", F.col("k").isNotNull())],
            unique_cols=[("k",)],
        )
    )
    assert all(r.passed == 1 and r.pct_ok == 100.0 for r in rep.values())


def test_referential_integrity_orphans(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (99,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rep = _report_map(
        quality.referential_integrity(child, parent, "fk", "pk", "child")
    )
    r = rep[("child", "ref:fk")]
    assert (r.metric_num, r.metric_den, r.passed) == (3, 4, 0)


def test_audit_single_scan_plan(spark):
    """All predicate checks on one table must share one aggregate: the
    physical plan reads the relation once (uniqueness adds an Expand but
    still no second scan)."""
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    rep = quality.audit_checks(
        df,
        "t",
        [
            quality.Check("a", F.col("k") >= 0),
            quality.Check("b", F.col("v") < 3),
            quality.Check("c", F.col("k") < 1000),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_audit_warehouse_on_testdata(spark, sf_dir):
    from cdc_poc_spark.sources.testdata import load_table

    rep = quality.audit_warehouse(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    rows = _report_map(rep)
    assert len(rows) == 11
    # the generated warehouse is referentially intact and key-unique
    assert rows[("lineitem", "ref:l_orderkey")].passed == 1
    assert rows[("orders", "unique:o_orderkey")].passed == 1
    for r in rows.values():
        assert 0.0 <= r.pct_ok <= 100.0
        assert r.metric_num <= r.metric_den

"""Bucketed co-located join: after bucketBy on the join key, a fact⋈fact
join must plan with NO shuffle exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.sources.testdata import load_table
from cdc_poc_spark.streaming.sinks import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    try:
        a = spark.table("b_lineitem")
        b = spark.table("b_orders")
        joined = a.join(b, a["l_orderkey"] == b["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same result as the unbucketed join
        plain = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        assert joined.count() == plain.count()
        got = joined.agg(F.sum("l_quantity")).collect()[0][0]
        want = plain.agg(F.sum("l_quantity")).collect()[0][0]
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_warehouse_partition_pruning(spark, tmp_path):
    """An event_hour predicate over the hour-partitioned warehouse must
    prune at the source: the scan's partition filters carry the predicate
    and only matching partition directories are read."""
    from cdc_poc_spark.plans import cdc_mapping
    from cdc_poc_spark.operators.enrich import enrich
    from cdc_poc_spark.streaming.sinks import HOUR_PARTITION_COL, write_warehouse

    ev = cdc_mapping.engagement_events(load_table(spark, SF_DIR, "events"))
    dim = cdc_mapping.content_dim(load_table(spark, SF_DIR, "part"))
    path = str(tmp_path / "wh")
    write_warehouse(enrich(ev, dim), path, mode="overwrite")

    fact = spark.read.parquet(path)
    hours = sorted(
        r[0] for r in fact.select(HOUR_PARTITION_COL).distinct().collect()
    )
    assert len(hours) > 1
    one_hour = fact.filter(F.col(HOUR_PARTITION_COL) == hours[0])
    plan = one_hour._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and str(hours[0]) in plan
    # the pruned scan must touch only the one partition's rows
    per_hour = {
        r[0]: r[1]
        for r in fact.groupBy(HOUR_PARTITION_COL).count().collect()
    }
    assert one_hour.count() == per_hour[hours[0]]

"""Salted-join tests: result equivalence with the plain join, left-join
semantics, and the physical-plan guarantee (no broadcast of the replicated
side when force_shuffle is set)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators.skew import salted_join
from cdc_poc_spark.plans import cdc_mapping as m
from cdc_poc_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _sides(spark):
    ev = m.engagement_events(load_table(spark, SF_DIR, "events")).select(
        "id", "content_id", "event_ts"
    )
    dim = m.content_dim(load_table(spark, SF_DIR, "part")).select(
        F.col("id").alias("content_id"), F.col("title"), "length_seconds"
    )
    return ev, dim


def _key_set(df):
    return {(r["id"], r["title"]) for r in df.collect()}


def test_inner_matches_plain_join(spark):
    ev, dim = _sides(spark)
    salted = salted_join(ev, dim, on="content_id", salt_buckets=8)
    plain = ev.join(dim, "content_id").select(*salted.columns)
    assert _key_set(salted) == _key_set(plain)
    assert salted.count() == plain.count()


def test_left_keeps_unmatched(spark):
    ev, dim = _sides(spark)
    small = dim.filter(F.col("content_id") < 50)
    salted = salted_join(ev, small, on="content_id", how="left", salt_buckets=4)
    plain = ev.join(small, "content_id", "left").select(*salted.columns)
    assert salted.count() == plain.count() == ev.count()
    assert _key_set(salted.filter(F.col("title").isNull())) == _key_set(
        plain.filter(F.col("title").isNull())
    )


def test_plan_has_no_broadcast(spark):
    ev, dim = _sides(spark)
    plan = salted_join(ev, dim, on="content_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan

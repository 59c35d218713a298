"""JDBC source path (reference S4: the content dimension read over JDBC,
reference generator.py:74-86) — exercised for real against embedded Apache
Derby, whose driver ships inside Spark's own jars. No mocks: the writes,
type round-trip, filter pushdown, and the dimension-join consumption below
all run through Spark's actual JDBC relation."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.sources.jdbc import (
    DERBY_DRIVER,
    read_jdbc_table,
    write_jdbc_table,
)


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp(prefix="derby_jdbc_")
    return f"jdbc:derby:{d}/db;create=true"


def test_jdbc_round_trip(spark, derby_url):
    dim = spark.createDataFrame(
        [(1, "intro-video", "video", 300), (2, "guide", "article", 600)],
        ["id", "slug", "content_type", "length_seconds"],
    )
    write_jdbc_table(dim, derby_url, "content_dim", driver=DERBY_DRIVER)
    back = read_jdbc_table(spark, derby_url, "content_dim", driver=DERBY_DRIVER)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in dim.collect()
    )


def test_jdbc_filter_pushdown_reaches_database(spark, derby_url):
    back = read_jdbc_table(spark, derby_url, "content_dim", driver=DERBY_DRIVER)
    plan = (
        back.filter(F.col("id") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the predicate must appear as a PushedFilter on the JDBC scan —
    # i.e. it is evaluated by the database, not post-scan in Spark
    assert "PushedFilters" in plan and "EqualTo(id,2)" in plan.replace('"', "")


def test_jdbc_dim_feeds_broadcast_enrichment_join(spark, derby_url):
    """The reference's actual S4 usage: the JDBC-read dimension is the
    small side of the stream/fact enrichment join."""
    dim = read_jdbc_table(
        spark, derby_url, "content_dim", driver=DERBY_DRIVER
    ).select("id", "slug", "length_seconds")
    events = spark.createDataFrame(
        [(10, 1, 120_000), (11, 2, 30_000), (12, 99, 5_000)],
        ["event_id", "content_id", "duration_ms"],
    )
    joined = events.join(F.broadcast(dim), events.content_id == dim.id, "inner")
    rows = {r["event_id"]: r["slug"] for r in joined.collect()}
    assert rows == {10: "intro-video", 11: "guide"}
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()


def test_jdbc_parallel_partitioned_read(spark, derby_url):
    big = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_jdbc_table(big, derby_url, "fact_rows", driver=DERBY_DRIVER)
    back = read_jdbc_table(
        spark,
        derby_url,
        "fact_rows",
        driver=DERBY_DRIVER,
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    # 4 range partitions, no rows lost or duplicated at the boundaries
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("k")).first()[0] == 999 * 1000 // 2

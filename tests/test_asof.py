"""As-of join unit tests — edge semantics the oracle diff can't isolate:
equal-timestamp ties, pre-first-version drops, left-join mode, and
null-attribute versions (the struct-carry guarantee)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_poc_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


EV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("ets", T.TimestampNTZType()),
    ]
)
VER_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("vts", T.TimestampNTZType()),
        T.StructField("name", T.StringType()),
        T.StructField("size", T.IntegerType()),
    ]
)


def _frames(spark):
    events = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-03T00:00:00")),  # between v1 and v2
            (2, 1, _ts("2024-01-05T00:00:00")),  # exactly at v2 -> v2
            (3, 1, _ts("2023-12-30T00:00:00")),  # before any version
            (4, 2, _ts("2024-01-04T00:00:00")),  # key with no versions
            (5, 1, _ts("2024-01-09T00:00:00")),  # after v3 (null name)
        ],
        EV_SCHEMA,
    )
    versions = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "a", 10),
            (1, _ts("2024-01-05T00:00:00"), "b", 20),
            (1, _ts("2024-01-08T00:00:00"), None, 30),  # null attribute
        ],
        VER_SCHEMA,
    )
    return events, versions


def test_inner_semantics(spark):
    events, versions = _frames(spark)
    out = asof_join(events, versions, on="k", left_ts="ets", right_ts="vts")
    got = {r["id"]: (r["name"], r["size"], r["vts"]) for r in out.collect()}
    assert set(got) == {1, 2, 5}  # 3 (too early) and 4 (no versions) dropped
    assert got[1] == ("a", 10, _ts("2024-01-01T00:00:00"))
    assert got[2] == ("b", 20, _ts("2024-01-05T00:00:00"))  # >= tie -> same-ts version
    # null attribute must come from v3 itself, not leak from v2 ("b")
    assert got[5] == (None, 30, _ts("2024-01-08T00:00:00"))


def test_left_semantics(spark):
    events, versions = _frames(spark)
    out = asof_join(events, versions, on="k", left_ts="ets", right_ts="vts", how="left")
    got = {r["id"]: r["vts"] for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[3] is None and got[4] is None


def test_column_collision_rejected(spark):
    events, versions = _frames(spark)
    try:
        asof_join(
            events,
            versions.withColumnRenamed("name", "id"),
            on="k",
            left_ts="ets",
            right_ts="vts",
        )
    except ValueError as e:
        assert "collision" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_stateful_stream_matches_batch(spark, tmp_path):
    """The applyInPandasWithState twin must agree with the batch operator —
    including across multiple micro-batches with late-ish events."""
    from cdc_poc_spark.streaming.stateful import (
        asof_enrich_stateful,
        interleave,
        UNION_SCHEMA,
    )

    events, versions = _frames(spark)
    ev = events.select(
        F.col("id"), F.col("k").alias("content_id"), F.col("ets").alias("event_ts")
    )
    ver = versions.select(
        F.col("k").alias("content_id"),
        F.col("vts").alias("version_ts"),
        F.col("name").alias("version_title"),
        F.col("size").alias("version_length_seconds"),
    )
    # batch 1: versions only; batch 2: all events (arrival after upserts) —
    # state (the version history) must survive the restart via checkpoint
    d = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    def _run():
        q = (
            asof_enrich_stateful(spark.readStream.schema(UNION_SCHEMA).parquet(d))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    interleave(ev.limit(0), ver).coalesce(1).write.mode("overwrite").parquet(d)
    _run()
    interleave(ev, ver.limit(0)).coalesce(1).write.mode("append").parquet(d)
    _run()
    got = {
        r["id"]: (r["version_title"], r["version_length_seconds"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = asof_join(ev, ver, on="content_id", left_ts="event_ts", right_ts="version_ts")
    want = {
        r["id"]: (r["version_title"], r["version_length_seconds"])
        for r in batch.collect()
    }
    assert got == want

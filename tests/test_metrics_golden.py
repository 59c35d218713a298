"""Golden-value tests for the derived metrics — hand-computed expectations
for the truncation/rounding edge cases (FIXTURES.md §5; reference semantics
model/EnrichedEvent.java:93-106)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.functions import metrics
from cdc_poc_spark.operators.enrich import enrich, enrichment_misses, latest_per_key

CASES = [
    # (duration_ms, length_seconds, expect_seconds, expect_pct)
    (999, 3600, 0, 0.0),        # sub-second truncates to 0 -> 0.00%
    (None, 3600, None, None),   # click: NULL duration
    (65000, 0, 65, None),       # zero length -> NULL pct
    (65000, None, 65, None),    # NULL length -> NULL pct
    (1000, 800, 1, 0.13),       # 1/800 = 0.00125 -> 0.0013 (HALF_UP) -> 0.13
    (60000, 120, 60, 50.0),     # exact half
    (3600000, 3600, 3600, 100.0),
    (7200000, 3600, 7200, 200.0),  # >100% allowed (ref has no cap)
    (59999, 60, 59, 98.33),     # 59/60 = 0.98333 -> 0.9833 -> 98.33
]


@pytest.mark.parametrize("dur,length,exp_s,exp_pct", CASES)
def test_engagement_metrics_golden(spark, dur, length, exp_s, exp_pct):
    df = spark.createDataFrame(
        [(dur, length)], "duration_ms int, length_seconds int"
    )
    es = metrics.engagement_seconds(F.col("duration_ms"))
    out = df.select(
        es.alias("es"),
        metrics.engagement_pct(es, F.col("length_seconds")).alias("pct"),
    ).collect()[0]
    assert out.es == exp_s
    assert out.pct == exp_pct


def test_valid_gate_excludes_null_keeps_zero(spark):
    df = spark.createDataFrame([(0.0,), (None,), (50.0,)], "pct double")
    got = df.filter(metrics.has_valid_engagement(F.col("pct"))).collect()
    assert sorted(r.pct for r in got) == [0.0, 50.0]


def _seed_dim(spark):
    return spark.createDataFrame(
        [("c1", "slug-1", "Title 1", "podcast", 3600, None),
         ("c2", "slug-2", "Title 2", "video", 0, None)],
        "id string, slug string, title string, content_type string, "
        "length_seconds int, publish_ts timestamp",
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, content_id string, user_id string, event_type string, "
        "event_ts timestamp, duration_ms int, device string, raw_payload string",
    )


def test_enrich_inner_join_and_miss_branch(spark):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = _events(
        spark,
        [
            (1, "c1", "u1", "play", ts, 1800000, "ios", None),
            (2, "c-missing", "u1", "play", ts, 1000, "ios", None),
            (3, "c2", "u2", "click", ts, None, "web", None),
        ],
    )
    dim = _seed_dim(spark)
    enriched = enrich(ev, dim)
    rows = {r.event_id: r for r in enriched.collect()}
    assert set(rows) == {1, 3}  # miss (event 2) dropped from main flow
    assert rows[1].engagement_seconds == 1800 and rows[1].engagement_pct == 50.0
    assert rows[3].engagement_seconds is None and rows[3].engagement_pct is None
    misses = enrichment_misses(ev, dim).collect()
    assert [m.id for m in misses] == [2]


def test_latest_per_key_tiebreak(spark):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", ts, 1, "first"), ("k", ts, 2, "second")],
        "key string, ts timestamp, seq long, val string",
    )
    out = latest_per_key(df, ["key"], "ts", "seq").collect()
    assert len(out) == 1 and out[0].val == "second"

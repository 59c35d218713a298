"""O1/O2/O8 + T8: Debezium wire-format parsing edge cases (FIXTURES.md §4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_poc_spark.schemas import ENGAGEMENT_EVENT_SCHEMA
from cdc_poc_spark.sources import debezium


def _wire_df(spark, records):
    return spark.createDataFrame([(json.dumps(r) if not isinstance(r, str) else r,) for r in records], "value string")


FULL = {
    "payload": {
        "after": {
            "id": 1,
            "content_id": "c-1",
            "user_id": "u-1",
            "event_type": "play",
            "event_ts": "2024-01-01T10:20:30.123456",
            "duration_ms": 65000,
            "device": "ios",
            "raw_payload": '{"quality": "HD"}',
        },
        "op": "c",
    }
}
NULLS = {
    "payload": {
        "after": {
            "id": 2,
            "content_id": "c-2",
            "user_id": "u-2",
            "event_type": "click",
            "event_ts": "2024-01-01T10:20:31.000000",
            "duration_ms": None,
            "device": "web",
            "raw_payload": None,
        },
        "op": "c",
    }
}
DELETE = {"payload": {"after": None, "op": "d"}}
CORRUPT = "{this is not json"


def test_envelope_happy_path(spark):
    parsed = debezium.parse_envelope(_wire_df(spark, [FULL]), ENGAGEMENT_EVENT_SCHEMA)
    row = debezium.good_rows(parsed).collect()[0]
    assert row.id == 1
    assert row.event_ts.microsecond == 123456
    assert row.duration_ms == 65000


def test_envelope_null_optional_fields(spark):
    parsed = debezium.parse_envelope(_wire_df(spark, [NULLS]), ENGAGEMENT_EVENT_SCHEMA)
    row = debezium.good_rows(parsed).collect()[0]
    assert row.duration_ms is None
    assert row.raw_payload is None


def test_envelope_delete_dropped_not_corrupt(spark):
    parsed = debezium.parse_envelope(
        _wire_df(spark, [FULL, DELETE]), ENGAGEMENT_EVENT_SCHEMA
    )
    assert debezium.good_rows(parsed).count() == 1
    assert debezium.dropped(parsed).count() == 1
    assert debezium.dead_letters(parsed).count() == 0


def test_envelope_corrupt_to_dead_letter(spark):
    parsed = debezium.parse_envelope(
        _wire_df(spark, [FULL, CORRUPT, DELETE]), ENGAGEMENT_EVENT_SCHEMA
    )
    assert debezium.good_rows(parsed).count() == 1
    assert debezium.dead_letters(parsed).count() == 1
    assert debezium.dropped(parsed).count() == 1


def test_unwrapped_shape(spark):
    """The flattened ExtractNewRecordState shape (SURVEY §3.1 ⚠) parses to
    the same typed rows; __op='d' is dropped."""
    flat = dict(FULL["payload"]["after"], __op="c", __source_ts_ms=1)
    flat_del = dict(FULL["payload"]["after"], __op="d", __source_ts_ms=2)
    parsed = debezium.parse_unwrapped(
        _wire_df(spark, [flat, flat_del]), ENGAGEMENT_EVENT_SCHEMA
    )
    rows = debezium.good_rows(parsed).collect()
    assert len(rows) == 1
    assert rows[0].id == 1 and rows[0].event_ts.microsecond == 123456


def test_envelope_and_unwrapped_agree(spark):
    env = debezium.good_rows(
        debezium.parse_envelope(_wire_df(spark, [FULL, NULLS]), ENGAGEMENT_EVENT_SCHEMA)
    )
    flats = [dict(r["payload"]["after"], __op="c") for r in (FULL, NULLS)]
    unw = debezium.good_rows(
        debezium.parse_unwrapped(_wire_df(spark, flats), ENGAGEMENT_EVENT_SCHEMA)
    )
    assert sorted(map(str, env.collect())) == sorted(map(str, unw.collect()))


def test_changelog_apply_semantics(spark):
    """Latest-change-wins with real delete handling: a key whose newest
    change is a delete disappears; a delete followed by a later re-create
    resurrects the row."""
    rows = [
        # key 1: create then update -> survives with v=2
        (1, 10, "c", 1), (1, 11, "u", 2),
        # key 2: create then delete -> absent
        (2, 20, "c", 1), (2, 21, "d", 2),
        # key 3: delete then re-create -> survives with v=31
        (3, 30, "d", 1), (3, 31, "c", 2),
        # key 4: single create -> survives
        (4, 40, "c", 1),
    ]
    changes = spark.createDataFrame(rows, ["row_key", "val", "op", "seq"])
    got = {
        r["row_key"]: (r["val"], r["op"])
        for r in debezium.changelog_apply(
            changes, ["row_key"], ["seq"], op_col="op"
        ).collect()
    }
    assert got == {1: (11, "u"), 3: (31, "c"), 4: (40, "c")}

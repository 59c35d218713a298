"""Declared schemas of the reference data model (SURVEY.md §1.2).

The reference declares its schema three times by hand (Postgres DDL
reference sql/init.sql:9-28, Java POJOs model/EngagementEvent.java:13-37 /
model/ContentInfo.java:12-31, BigQuery schema sinks/BigQuerySink.java:104-120).
Here it is declared once and reused by sources, operators, and sinks.
"""

from __future__ import annotations

from pyspark.sql import types as T

# content dimension — reference sql/init.sql:9-16, model/ContentInfo.java:12-31
CONTENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("slug", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("length_seconds", T.IntegerType(), True),
        T.StructField("publish_ts", T.TimestampType(), True),
    ]
)

# engagement_events fact — reference sql/init.sql:19-28, model/EngagementEvent.java:13-37
ENGAGEMENT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), False),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("raw_payload", T.StringType(), True),
    ]
)

VALID_EVENT_TYPES = ("play", "pause", "click", "finish")  # sql/init.sql:23
VALID_CONTENT_TYPES = ("podcast", "newsletter", "video")  # sql/init.sql:13

# Enriched output: 8 event cols + 5 content cols + 2 derived = 15 columns
# (model/EnrichedEvent.java:15-64; BigQuery landing schema BigQuerySink.java:104-120)
ENRICHED_COLUMNS = [
    "event_id",
    "content_id",
    "user_id",
    "event_type",
    "event_ts",
    "duration_ms",
    "device",
    "raw_payload",
    "content_slug",
    "content_title",
    "content_type",
    "length_seconds",
    "publish_ts",
    "engagement_seconds",
    "engagement_pct",
]


def _row_schema(cols: T.StructType) -> T.StructType:
    return cols


def debezium_envelope_schema(after: T.StructType) -> T.StructType:
    """Debezium JSON change-record envelope (schemaless JSON converter,
    reference postgres-connector.json:33-36; parsed shape
    EngagementStreamingJob.java:216-250): ``payload.after`` carries the row,
    ``payload.op`` the change kind, ``payload.source`` provenance.

    Timestamps travel as strings with the microsecond pattern
    yyyy-MM-dd'T'HH:mm:ss.SSSSSS (EngagementStreamingJob.java:237-239), so the
    ``after`` struct passed in should use StringType for timestamp columns and
    cast after extraction.
    """
    source = T.StructType(
        [
            T.StructField("db", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )
    payload = T.StructType(
        [
            T.StructField("before", after, True),
            T.StructField("after", after, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("source", source, True),
        ]
    )
    return T.StructType([T.StructField("payload", payload, True)])


def stringly(schema: T.StructType) -> T.StructType:
    """The same struct with every timestamp column as StringType — the wire
    shape of Debezium JSON rows before F1 timestamp parsing (SURVEY §2.6 F1)."""
    fields = []
    for f in schema.fields:
        is_ts = isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
        dt = T.StringType() if is_ts else f.dataType
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)

"""Mapping of the driver's testdata tables onto the reference data model
(FIXTURES.md §7), defined ONCE for both sides of the correctness harness:

- DataFrame builders (engine side) and
- SQL CTE strings (DuckDB-oracle side)

live next to each other in this module so they cannot drift.

Correspondence (FIXTURES.md §7):
- ``events``  -> ``engagement_events`` fact: ``props.k`` (0-99) is the
  content FK, ``value`` (seconds, double) stands in for the engagement
  duration -> ``duration_ms = floor(value*1000)``, NULL for 'click' events
  (mirroring the reference where clicks carry no duration,
  reference generator.py:93-110); a deterministic device is derived from
  user_id so the A2/A3 "last device" aggregates are exercised.
- ``part``    -> ``content`` dimension: ``length_seconds = p_size * 60``
  (p_size 1..50 -> 60..3000 s, the seed dim's range, reference
  sql/init.sql:40-60).

Portability notes (Spark vs DuckDB must agree bit-for-bit):
- double->int truncation: Spark ``CAST(x AS INT)`` truncates, DuckDB rounds;
  both sides therefore use explicit ``floor`` / ``//``.
- ``/`` on integers is double division in both engines.
- ``round(double, n)`` is HALF_UP in Spark (BigDecimal) and
  half-away-from-zero in DuckDB — identical on the non-negative domain here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import spread
from ..operators.enrich import enrich as _enrich

# ---------------------------------------------------------------- engine side


def engagement_events(events: DataFrame) -> DataFrame:
    """events -> ENGAGEMENT_EVENT_SCHEMA-shaped fact (keys as bigint).

    The raw scan is spread before the mapping expressions: the per-row JSON
    FK extraction (get_json_object) is the CPU-heavy step of every cdc_*
    query, and must not serialize onto one core when the input is a single
    under-split file (no-op on a real multi-split cluster scan)."""
    events = spread(events, "event_id")
    return events.select(
        F.col("event_id").alias("id"),
        F.get_json_object("props", "$.k").cast("long").alias("content_id"),
        "user_id",
        "event_type",
        F.col("ts").alias("event_ts"),
        F.when(
            F.col("event_type") != "click",
            F.floor(F.col("value") * 1000).cast("int"),
        ).alias("duration_ms"),
        _device_expr(F.col("user_id")).alias("device"),
        F.col("props").alias("raw_payload"),
    )


def _device_expr(user_id):
    m = (user_id % 3).cast("int")
    return (
        F.when(m == 0, F.lit("ios")).when(m == 1, F.lit("android")).otherwise(F.lit("web"))
    )


def content_dim(part: DataFrame) -> DataFrame:
    """part -> CONTENT_SCHEMA-shaped dimension (keys as bigint)."""
    return part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("slug"),
        F.col("p_name").alias("title"),
        F.col("p_type").alias("content_type"),
        (F.col("p_size") * 60).cast("int").alias("length_seconds"),
        F.lit(None).cast("timestamp").alias("publish_ts"),
    )


def enriched(events: DataFrame, part: DataFrame) -> DataFrame:
    """Full 15-column enriched output (J1 + O3/O4/O5) over driver tables."""
    return _enrich(engagement_events(events), content_dim(part))


N_DIM_VERSIONS = 4


def dim_versions(part: DataFrame) -> DataFrame:
    """Synthetic SCD-style dimension history for the as-of join: per content
    id, N_DIM_VERSIONS versions published weekly across the events' January
    2024 span (day 1/8/15/22, hour = id % 24), title and length changing per
    version. Deterministic and tz-free (make_timestamp_ntz), with a textual
    SQL twin in VERSIONS_CTE."""
    dim = content_dim(part).select("id", "title", "length_seconds")
    v = F.col("v")
    return dim.select(
        F.col("id").alias("content_id"),
        "title",
        "length_seconds",
        F.explode(F.array(*[F.lit(i) for i in range(N_DIM_VERSIONS)])).alias("v"),
    ).select(
        "content_id",
        F.concat_ws("", F.col("title"), F.lit(" v"), v.cast("string")).alias(
            "version_title"
        ),
        (F.col("length_seconds") + v).cast("int").alias("version_length_seconds"),
        F.make_timestamp_ntz(
            F.lit(2024),
            F.lit(1),
            F.lit(1) + F.lit(7) * v,
            (F.col("content_id") % 24).cast("int"),
            F.lit(0),
            F.lit(0),
        ).alias("version_ts"),
    )


# ---------------------------------------------------------------- oracle side

# Keep these CTEs textually in sync with the builders above.
EVENTS_CTE = """
engagement_events AS (
    SELECT
        event_id AS id,
        CAST(props ->> 'k' AS BIGINT) AS content_id,
        user_id,
        event_type,
        ts AS event_ts,
        CASE WHEN event_type <> 'click'
             THEN CAST(floor(value * 1000) AS INTEGER) END AS duration_ms,
        CASE CAST(user_id % 3 AS INTEGER)
             WHEN 0 THEN 'ios' WHEN 1 THEN 'android' ELSE 'web'
        END AS device,
        props AS raw_payload
    FROM events
)"""

CONTENT_CTE = """
content AS (
    SELECT
        p_partkey AS id,
        p_brand AS slug,
        p_name AS title,
        p_type AS content_type,
        CAST(p_size * 60 AS INTEGER) AS length_seconds,
        CAST(NULL AS TIMESTAMP) AS publish_ts
    FROM part
)"""

ENRICHED_CTE = """
enriched AS (
    SELECT
        e.id AS event_id,
        e.content_id,
        e.user_id,
        e.event_type,
        e.event_ts,
        e.duration_ms,
        e.device,
        e.raw_payload,
        c.slug AS content_slug,
        c.title AS content_title,
        c.content_type,
        c.length_seconds,
        c.publish_ts,
        CAST(e.duration_ms // 1000 AS INTEGER) AS engagement_seconds,
        CASE WHEN e.duration_ms IS NOT NULL AND c.length_seconds > 0
             THEN round(round((e.duration_ms // 1000) / c.length_seconds, 4) * 100, 2)
        END AS engagement_pct
    FROM engagement_events e
    JOIN content c ON e.content_id = c.id
)"""


VERSIONS_CTE = """
versions AS (
    SELECT
        id AS content_id,
        title || ' v' || v AS version_title,
        CAST(length_seconds + v AS INTEGER) AS version_length_seconds,
        make_timestamp(2024, 1, 1 + 7 * v,
                       CAST(id % 24 AS INTEGER), 0, CAST(0 AS DOUBLE)) AS version_ts
    FROM content
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS v) AS vs
)"""


def with_versions(body: str) -> str:
    """Compose an oracle query over events + the versioned dimension."""
    return (
        f"WITH {EVENTS_CTE.strip()}, {CONTENT_CTE.strip()}, {VERSIONS_CTE.strip()}\n{body}"
    )


def with_enriched(body: str) -> str:
    """Compose an oracle query over the shared enriched CTE chain."""
    return f"WITH {EVENTS_CTE.strip()}, {CONTENT_CTE.strip()}, {ENRICHED_CTE.strip()}\n{body}"


VALID_FILTER_SQL = "engagement_pct IS NOT NULL AND engagement_pct >= 0"

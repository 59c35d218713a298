"""Derived engagement metrics and validity predicates (SURVEY §2.2 O4–O7,
§2.6 F5/F6/F9) as pure Column expressions — JVM-side, Catalyst-optimizable,
no Python UDFs anywhere in the hot path.

Reference semantics being reproduced:

- ``engagement_seconds = duration_ms / 1000`` with **integer truncation**,
  null-safe (reference model/EnrichedEvent.java:93-96).
- ``engagement_pct = round(round(engagement_seconds / length_seconds, 4)
  * 100, 2)`` with BigDecimal HALF_UP at both roundings; NULL when either
  input is NULL or ``length_seconds <= 0``
  (reference model/EnrichedEvent.java:98-106).
- ``hasValidEngagement``: pct IS NOT NULL AND pct >= 0 — the gate applied
  before every standing aggregation (reference model/EnrichedEvent.java:162-164,
  sinks/RedisSink.java:136-140).
- ``isHighEngagement``: pct >= 50 (defined but unused in the reference,
  model/EnrichedEvent.java:166-168).

Spark's ``round`` on DoubleType goes through BigDecimal HALF_UP (matching the
reference's Java BigDecimal exactly); the DuckDB oracle's ``round`` on DOUBLE
is half-away-from-zero, identical to HALF_UP for non-negative ratios, so the
two agree on this domain (ratios are >= 0 whenever non-null).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def engagement_seconds(duration_ms: Column) -> Column:
    """Truncating integer division ms -> s (EnrichedEvent.java:95)."""
    return (duration_ms / F.lit(1000)).cast("int")


def engagement_pct(eng_seconds: Column, length_seconds: Column) -> Column:
    """Two-stage HALF_UP rounding of the watch ratio (EnrichedEvent.java:98-106).

    NULL if either input is NULL or length_seconds <= 0.
    """
    ratio = F.round(eng_seconds.cast("double") / length_seconds.cast("double"), 4)
    pct = F.round(ratio * F.lit(100), 2)
    return F.when(
        eng_seconds.isNotNull() & length_seconds.isNotNull() & (length_seconds > 0),
        pct,
    )


def has_valid_engagement(pct: Column) -> Column:
    """Aggregation gate O6 (EnrichedEvent.java:162-164)."""
    return pct.isNotNull() & (pct >= 0)


def is_high_engagement(pct: Column) -> Column:
    """Predicate O7 (EnrichedEvent.java:166-168)."""
    return pct >= 50


# F1 — Debezium wire timestamp pattern (EngagementStreamingJob.java:238-239)
DEBEZIUM_TS_PATTERN = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def parse_wire_timestamp(col: Column) -> Column:
    """F1: parse the microsecond ISO-ish wire pattern into TimestampType."""
    return F.to_timestamp(col, DEBEZIUM_TS_PATTERN)


def minute_bucket(ts: Column) -> Column:
    """F2: minute bucket key, reference pattern yyyy-MM-dd:HH:mm
    (RedisSink.java:224-225)."""
    return F.date_format(ts, "yyyy-MM-dd:HH:mm")


def composite_key(*cols: Column) -> Column:
    """F4: ':'-joined composite member keys (RedisSink.java:180-181)."""
    return F.concat_ws(":", *cols)

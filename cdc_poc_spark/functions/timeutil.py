"""Timezone-independent TIMESTAMP_NTZ helpers.

Spark's ``date_trunc`` / ``date_format`` silently cast TIMESTAMP_NTZ through
TimestampType using the *session* timezone, so their results shift when the
session tz isn't UTC — observed as a 5-hour skew under America/New_York.
Since the driver's harness runs our queries on a session we don't control,
every temporal operator over driver data (which loads as NTZ) must be
tz-free. These helpers are built purely from field extraction /
construction, which never consults a timezone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Debezium wire pattern (reference EngagementStreamingJob.java:238-239)
WIRE_PATTERN = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def ntz_trunc(unit: str, col: Column | str) -> Column:
    """date_trunc for NTZ without the session-tz round trip.

    Supported units: day, hour, minute (the ones the engine uses).
    """
    c = F.col(col) if isinstance(col, str) else col
    y, mo, d = F.year(c), F.month(c), F.dayofmonth(c)
    zero = F.lit(0)
    if unit == "day":
        return F.make_timestamp_ntz(y, mo, d, zero, zero, zero)
    if unit == "hour":
        return F.make_timestamp_ntz(y, mo, d, F.hour(c), zero, zero)
    if unit == "minute":
        return F.make_timestamp_ntz(y, mo, d, F.hour(c), F.minute(c), zero)
    raise ValueError(f"unsupported unit: {unit}")


def format_wire_ntz(col: Column | str) -> Column:
    """F3/F1 inverse: format an NTZ as the Debezium wire pattern, tz-free.

    ``date_part('SECOND')`` yields decimal seconds incl. microseconds, so the
    fraction math is exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    sec = F.date_part(F.lit("SECOND"), c)
    whole = F.floor(sec).cast("int")
    micros = ((sec - F.floor(sec)) * 1000000).cast("int")
    return F.format_string(
        "%04d-%02d-%02dT%02d:%02d:%02d.%06d",
        F.year(c), F.month(c), F.dayofmonth(c), F.hour(c), F.minute(c), whole, micros,
    )


def parse_wire_ntz(col: Column | str) -> Column:
    """F1 for NTZ: parse the µs wire pattern without tz involvement."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp_ntz(c, F.lit(WIRE_PATTERN))

"""Gap-based sessionization — the batch twin of Structured Streaming's
``session_window``, via the classic gap-and-islands plan.

The reference has no sessionization (SURVEY §2.4 lists it as notably
absent); it belongs to the warehouse read path our engine adds on top
(arbitrary SQL over the fact table, SURVEY §3.3.3).

Plan shape at scale: ONE shuffle on the session key; both window passes
(lag -> new-session flag, running sum -> session sequence) share the same
partitioning + ordering so Catalyst runs them in a single sort; the final
per-session aggregate is a hash aggregate with map-side partials. All
timestamp math is interval-based (tz-free, NTZ-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign events to sessions: a new session starts when the gap since
    the previous event of the same ``key`` exceeds ``gap_minutes``.

    Returns per-session rows: key, session_seq (0-based per key),
    session_start, session_end, n_events.

    Determinism contract (shared with the DuckDB oracle in
    plans/oracles.py): NULL timestamps are dropped (a NULL ts belongs to
    no session, and engines disagree on NULL sort position), and when
    ``tiebreak`` is given, both window passes order by (ts, tiebreak) so
    the lag/running-sum row order is engine-stable even with duplicate
    timestamps.
    """
    order = [ts_col, tiebreak] if tiebreak else [ts_col]
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    new_session = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > gap, F.lit(1)
    ).otherwise(F.lit(0))
    seq = (
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_seq")
    )
    return (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(key), F.col(ts_col), seq)
        .groupBy(key, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


DIRECT_CHANNEL = "direct"  # sessions whose only events are conversions


def attribution(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
) -> DataFrame:
    """First-touch / last-touch conversion attribution over gap-based
    sessions: for every session, its conversion revenue (sum of
    ``value_col`` on ``conversion_type`` events, exact DECIMAL) is credited
    to the session's first and last non-conversion touch channel
    (``type_col``); sessions with no touch credit ``DIRECT_CHANNEL``.

    Output: (touch in {'first','last'}, channel, n_sessions, revenue) —
    the standard marketing-analytics attribution comparison.

    Plan shape: the same single gap-and-islands shuffle as
    :func:`sessionize` (lag + running sum share one sort), then ONE
    per-session hash aggregate where first/last touch are min/max over
    (ts, tiebreak, channel) structs — order-independent, engine-stable —
    and finally a map-side explode of the two credit rows per session into
    ONE small groupBy. The events table is scanned exactly once."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    new_session = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > gap, F.lit(1)
    ).otherwise(F.lit(0))
    seq = (
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_seq")
    )
    is_touch = F.col(type_col) != conversion_type
    touch_struct = F.when(
        is_touch, F.struct(F.col(ts_col), F.col(tiebreak), F.col(type_col).alias("ch"))
    )
    sessions_df = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(key), F.col(ts_col), F.col(tiebreak), F.col(type_col), F.col(value_col), seq)
        .groupBy(key, "session_seq")
        .agg(
            F.sum(
                F.when(
                    F.col(type_col) == conversion_type,
                    F.col(value_col).cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).alias("revenue"),
            F.min(touch_struct).alias("first_t"),
            F.max(touch_struct).alias("last_t"),
        )
    )
    credit = F.explode(
        F.array(
            F.struct(
                F.lit("first").alias("touch"),
                F.coalesce(F.col("first_t.ch"), F.lit(DIRECT_CHANNEL)).alias("channel"),
            ),
            F.struct(
                F.lit("last").alias("touch"),
                F.coalesce(F.col("last_t.ch"), F.lit(DIRECT_CHANNEL)).alias("channel"),
            ),
        )
    )
    return (
        sessions_df.select(F.col("revenue"), credit.alias("c"))
        .groupBy(F.col("c.touch").alias("touch"), F.col("c.channel").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("revenue").cast("double").alias("revenue"),
        )
    )

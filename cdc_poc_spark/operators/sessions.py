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

"""As-of (temporal) join — the event-time-correct restatement of the
reference's keyed-state streaming lookup join (J1, reference
EngagementStreamingJob.java:308-349).

The reference enriches each event with whatever dimension version happens to
be in per-key MapState at *arrival* (processing-time as-of, SURVEY §2.3) —
nondeterministic under replay. The deterministic, replayable semantic is the
event-time as-of join: each event matches the latest dimension version with
``version_ts <= event_ts``; events preceding every version are dropped
(inner), mirroring the reference's enrichment-miss side output
(EngagementStreamingJob.java:329-333).

Spark-first plan — the merge formulation, not a range join:

  union both sides -> one hash shuffle on the key -> per-partition sort ->
  running ``last(ignorenulls)`` window -> filter left rows

A naive ``left.join(right, key == key & l_ts >= r_ts)`` + max-per-event
materializes O(events × versions-per-key) rows before pruning; the window
formulation touches each row exactly once after a single shuffle, so it
scales linearly to 100 TB and arbitrarily many versions per key. Skewed
keys behave like any windowed aggregation (AQE skew handling applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "_asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the latest right row with the same ``on`` key
    and ``right_ts <= left_ts``.

    Output columns: every ``left`` column, then ``right_ts`` (the matched
    version's timestamp, null when unmatched under ``how='left'``), then the
    remaining right columns. Column names must not collide (rename before
    calling). Rows of ``right`` sharing (key, right_ts) are not ordered
    among themselves — give versions distinct timestamps per key.

    ``how``: 'inner' drops unmatched left rows; 'left' keeps them with
    nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    rvals = [c for c in right.columns if c not in (on, right_ts)]
    collisions = set(left.columns) & set([right_ts, *rvals])
    if collisions:
        raise ValueError(f"column collision: {sorted(collisions)}")
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    # the version travels as ONE struct so last(ignorenulls) can never mix
    # fields from different versions when an attribute is null
    rstruct_type = T.StructType(
        [T.StructField(right_ts, rtypes[right_ts])]
        + [T.StructField(c, rtypes[c]) for c in rvals]
    )
    lside = left.select(
        F.lit(True).alias(_SIDE),
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    rside = right.select(
        F.lit(False).alias(_SIDE),
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left.columns],
        F.struct(F.col(right_ts), *[F.col(c) for c in rvals]).alias("_r"),
    )
    # right rows sort before left at equal _ts, so an event lands on the
    # version published at exactly its timestamp (ASOF >= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    filled = lside.unionByName(rside).select(
        F.col(_SIDE),
        *left.columns,
        matched[right_ts].alias(right_ts),
        *[matched[c].alias(c) for c in rvals],
    )
    out = filled.filter(F.col(_SIDE)).drop(_SIDE)
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out

"""Event analytics: ordered funnels and cohort retention.

Staple product-analytics queries over the events stream — the read-side
workloads a warehouse serving event data answers daily. The reference's
serving views stop at leaderboards/minute buckets (RedisSink.java); these
extend the family with the two canonical user-journey shapes:

- funnel: how many users perform step1 -> step2 -> ... IN ORDER (each step
  strictly after the previous one's first completion);
- cohort retention: of the users who first appeared in week W, how many
  were active in week W+k.

Scale design: funnels are S chained min-aggregates on user_id (S = number
of steps, each a shrinking shuffle on the same key — AQE reuses the
partitioning); retention is two hash aggregates on (user, week). No
windows over unbounded partitions, no collects; final reports are
dashboard-sized. Week arithmetic is pure day-ordinal integer math from a
fixed epoch (no date_trunc('week') — engines disagree on week-start and
session-tz handling; datediff on NTZ days is tz-free in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.timeutil import ntz_trunc

FUNNEL_STEPS = ("view", "click", "purchase")
COHORT_EPOCH = "2024-01-01"


def event_funnel(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered-funnel completion counts: users_reached at step k = users
    with a step-k event strictly after their first completion of step k-1
    (first-touch attribution). Step 0 is "any activity".

    Output: (step, step_name, users_reached, conversion_pct) with
    conversion measured against step 0.
    """
    ev = events.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id", "ts", "event_type")

    # chained per-user first-completion times: frame k holds (user_id, tk)
    reached = ev.select("user_id").distinct()
    counts = [reached.agg(F.count(F.lit(1)).alias("n0"))]
    prev = None  # (frame with user_id + prev step time column)
    for i, step in enumerate(steps, start=1):
        cand = ev.filter(F.col("event_type") == step)
        if prev is not None:
            cand = cand.join(prev, "user_id").filter(
                F.col("ts") > F.col(f"t{i - 1}")
            )
        cur = cand.groupBy("user_id").agg(F.min("ts").alias(f"t{i}"))
        counts.append(cur.agg(F.count(F.lit(1)).alias(f"n{i}")))
        prev = cur

    # all counts are 1-row aggregates: broadcast-join them and unpivot in
    # ONE projection (explode of a struct array — no per-branch re-scan)
    joined = counts[0]
    for c in counts[1:]:
        joined = joined.join(F.broadcast(c))
    rows = [
        F.struct(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.col(f"n{i}").cast("long").alias("users_reached"),
        )
        for i, name in enumerate(("any", *steps))
    ]
    return joined.select(
        F.col("n0"), F.explode(F.array(*rows)).alias("r")
    ).select(
        F.col("r.step").alias("step"),
        F.col("r.step_name").alias("step_name"),
        F.col("r.users_reached").alias("users_reached"),
        F.round(
            F.col("r.users_reached").cast("double")
            * F.lit(100.0)
            / F.col("n0").cast("double"),
            4,
        ).alias("conversion_pct"),
    )


def _week_index(ts_col, epoch: str = COHORT_EPOCH):
    day = F.datediff(
        ntz_trunc("day", ts_col), F.lit(epoch).cast("timestamp_ntz")
    )
    return F.floor(day / 7).cast("int")


def cohort_retention(events: DataFrame, epoch: str = COHORT_EPOCH) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-activity
    week; for each later week, the fraction still active.

    Output: (cohort_week, week_index, n_users, retention_pct) where
    retention is against the cohort's week-0 size (per the first-activity
    definition, every cohort user is active in week 0)."""
    ev = events.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id", _week_index(F.col("ts"), epoch).alias("week"))

    active = ev.distinct()  # (user, week) activity matrix
    cohorts = active.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    cells = (
        active.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_index"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    base = cells.filter(F.col("week_index") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            F.col("week_index").cast("int").alias("week_index"),
            "n_users",
            F.round(
                F.col("n_users").cast("double")
                * F.lit(100.0)
                / F.col("cohort_size").cast("double"),
                4,
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_index")
    )

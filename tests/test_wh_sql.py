"""Warehouse SQL-surface tests that the oracle diff can't express:
approx_count_distinct error bounds and grouping-set structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.plans.registry import queries
from cdc_poc_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_users_error_bound(spark):
    """HLL++ estimate must be within 5% of exact per group (default rsd is
    0.05; the 150-user corpus is far below sketch saturation)."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in queries()["wh_approx_users"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_approx_percentiles_error_bound(spark):
    """GK-sketch quantiles at accuracy 10000 must land within 1% of the
    exact interpolated percentiles per group (rank error <= 1/accuracy;
    value tolerance is loose on top of that for interpolation)."""
    approx = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"])
        for r in queries()["wh_approx_percentiles"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: (r["p50_value"], r["p90_value"])
        for r in queries()["wh_percentiles"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for k, (a50, a90) in approx.items():
        e50, e90 = exact[k]
        assert abs(a50 - e50) <= max(0.5, 0.01 * abs(e50)), (k, a50, e50)
        assert abs(a90 - e90) <= max(0.5, 0.01 * abs(e90)), (k, a90, e90)


def test_rollup_totals_consistent(spark):
    """The grand-total rollup row must equal the sum of the leaf rows."""
    rows = queries()["wh_rollup"](spark, SF_DIR).collect()
    leaves = [r for r in rows if r["gid"] == 0]
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["n"] == sum(r["n"] for r in leaves)
    assert abs(total[0]["sum_qty"] - sum(r["sum_qty"] for r in leaves)) < 1e-6


def test_sessions_cover_all_events(spark):
    """Session event counts must partition the event set per user."""
    sess = queries()["wh_sessions"](spark, SF_DIR)
    per_user = {
        r["user_id"]: r["total"]
        for r in sess.groupBy("user_id")
        .agg(F.sum("n_events").alias("total"))
        .collect()
    }
    events = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_user == events


def test_heavy_hitters_cms_bound(spark):
    """Count-Min guarantee for the PORTABLE sketch the registry runs:
    est >= true, and est <= true + eps*N with eps = e/width (N = total
    events). Candidates must cover every recently-active user."""
    import math

    from cdc_poc_spark.operators.sketches import CMS_PORT_WIDTH
    from cdc_poc_spark.plans.registry import HEAVY_HITTER_RECENT

    ev = load_table(spark, SF_DIR, "events")
    n_total = ev.count()
    est = {
        r["user_id"]: r["est_count"]
        for r in queries()["wh_heavy_hitters"](spark, SF_DIR).collect()
    }
    recent_users = {
        r["user_id"]
        for r in ev.filter(F.col("ts") >= F.lit(HEAVY_HITTER_RECENT))
        .select("user_id")
        .distinct()
        .collect()
    }
    assert set(est) == recent_users
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    slack = math.e / CMS_PORT_WIDTH * n_total
    for uid, e in est.items():
        true = exact[uid]
        assert true <= e <= true + slack, (uid, e, true, slack)


def test_recursive_spine_gapfill(spark):
    """The recursive date spine must cover every day in the range and mark
    the deterministically-holed days (day-of-month % 7 == 3) as gaps."""
    from cdc_poc_spark.plans.registry import q_wh_recursive_spine

    rows = q_wh_recursive_spine(spark, SF_DIR).collect()
    assert len(rows) == 30  # events span 2024-01-01..2024-01-30
    gaps = {r.day.day for r in rows if r.is_gap}
    assert gaps == {3, 10, 17, 24}
    for r in rows:
        assert r.is_gap == (r.n_events == 0)


def test_attribution_semantics(spark):
    """Constructed sessions: revenue lands on the first/last non-purchase
    touch; purchase-only sessions credit 'direct'; the 30-min gap splits."""
    import datetime as dt

    from cdc_poc_spark.operators.sessions import attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, mins, typ, val):
        return (eid, t0 + dt.timedelta(minutes=mins), uid, typ, val)

    rows = [
        # user 1, session A: view -> click -> purchase(10)
        ev(1, 1, 0, "view", 0.0),
        ev(2, 1, 5, "click", 0.0),
        ev(3, 1, 10, "purchase", 10.0),
        # user 1, session B (gap > 30): purchase only -> direct(7)
        ev(4, 1, 60, "purchase", 7.0),
        # user 2, one session: click -> purchase(5) -> view
        ev(5, 2, 0, "click", 0.0),
        ev(6, 2, 1, "purchase", 5.0),
        ev(7, 2, 2, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    got = {
        (r["touch"], r["channel"]): (r["n_sessions"], r["revenue"])
        for r in attribution(df).collect()
    }
    assert got == {
        ("first", "view"): (1, 10.0),
        ("first", "click"): (1, 5.0),
        ("first", "direct"): (1, 7.0),
        ("last", "click"): (1, 10.0),
        ("last", "view"): (1, 5.0),
        ("last", "direct"): (1, 7.0),
    }


def test_event_pattern_regex_semantics(spark):
    """Pin the conversion-pattern semantics on constructed journeys:
    non-overlapping counting, and the no-purchase-between constraint."""
    from pyspark.sql import functions as F

    from cdc_poc_spark.plans.registry import CONVERSION_PATTERN

    cases = {
        "vcp": 1,        # the plain journey
        "vcpvcp": 2,     # non-overlapping repeat
        "vpc": 0,        # purchase between view and click kills the match
        "vcvcp": 1,      # one match spans the detour
        "vsecp": 1,      # signup/error noise inside the journey is fine
        "ssee": 0,       # no journey at all
        "cpv": 0,        # wrong order
    }
    df = spark.createDataFrame(list(cases.items()), "journey string, want int")
    got = df.select(
        "journey",
        "want",
        F.regexp_count(F.col("journey"), F.lit(CONVERSION_PATTERN)).alias("got"),
    ).collect()
    for r in got:
        assert r.got == r.want, (r.journey, r.got, r.want)


def test_negative_samples_never_interacted(spark):
    """Every sampled negative must be a (user, content) pair absent from
    the interaction set, with exactly K per user and contiguous ranks."""
    from collections import Counter

    from pyspark.sql import functions as F

    from cdc_poc_spark.plans import cdc_mapping as m
    from cdc_poc_spark.plans.registry import NEG_SAMPLES_K, q_wh_negative_samples
    from cdc_poc_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    neg = q_wh_negative_samples(spark, sf).collect()
    assert neg
    inter = {
        (r.user_id, r.content_id)
        for r in m.engagement_events(load_table(spark, sf, "events"))
        .select("user_id", "content_id")
        .filter(F.col("content_id").isNotNull())
        .distinct()
        .collect()
    }
    assert all((r.user_id, r.content_id) not in inter for r in neg)
    per = Counter(r.user_id for r in neg)
    assert set(per.values()) == {NEG_SAMPLES_K}
    ranks: dict[int, list[int]] = {}
    for r in neg:
        ranks.setdefault(r.user_id, []).append(r.neg_rank)
    assert all(sorted(v) == list(range(1, NEG_SAMPLES_K + 1)) for v in ranks.values())


def test_equidepth_hist_balanced_buckets(spark):
    """Equi-depth invariant on the driver data: every type has exactly 10
    buckets, total counts equal the row count, and buckets are balanced
    within interpolation slack (no bucket further than 20% from n/10)."""
    from cdc_poc_spark.plans.registry import (
        EQUIDEPTH_BUCKETS,
        q_wh_equidepth_hist,
    )
    from cdc_poc_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.01"
    rows = q_wh_equidepth_hist(spark, sf).collect()
    per: dict[str, dict[int, int]] = {}
    for r in rows:
        per.setdefault(r.event_type, {})[r.bucket] = r.n_values
    ev = load_table(spark, sf, "events").filter("value IS NOT NULL")
    totals = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "cnt").collect()
    }
    for t, buckets in per.items():
        assert set(buckets) == set(range(EQUIDEPTH_BUCKETS))
        n = totals[t]
        assert sum(buckets.values()) == n
        target = n / EQUIDEPTH_BUCKETS
        assert all(abs(c - target) <= 0.2 * target for c in buckets.values())


def test_native_approx_users_error_bound(spark):
    """The engine-internal HLL++ fast path (library function; the registry
    runs the portable oracle-checkable twin) keeps the same 5% bound."""
    from cdc_poc_spark.operators.sketches import native_approx_users

    ev = load_table(spark, SF_DIR, "events")
    approx = {
        r["event_type"]: r["approx_users"]
        for r in native_approx_users(ev).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_native_approx_percentiles_error_bound(spark):
    """The engine-internal GK fast path keeps the 1% bound vs exact."""
    from cdc_poc_spark.operators.sketches import native_approx_percentiles

    ev = load_table(spark, SF_DIR, "events")
    approx = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"])
        for r in native_approx_percentiles(ev).collect()
    }
    exact = {
        r["event_type"]: (r["p50_value"], r["p90_value"])
        for r in queries()["wh_percentiles"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for k, (a50, a90) in approx.items():
        e50, e90 = exact[k]
        assert abs(a50 - e50) <= max(0.5, 0.01 * abs(e50)), (k, a50, e50)
        assert abs(a90 - e90) <= max(0.5, 0.01 * abs(e90)), (k, a90, e90)


def test_native_heavy_hitters_cms_bound(spark):
    """The engine-internal count_min_sketch path (driver-probe library
    function) keeps the CMS guarantee est in [true, true + eps*N]."""
    from cdc_poc_spark.operators.sketches import (
        CMS_EPS,
        heavy_hitters_over_candidates,
    )
    from cdc_poc_spark.plans.registry import HEAVY_HITTER_RECENT

    ev = load_table(spark, SF_DIR, "events")
    n_total = ev.count()
    recent = ev.filter(F.col("ts") >= F.lit(HEAVY_HITTER_RECENT)).select(
        "user_id"
    )
    est = {
        r["user_id"]: r["est_count"]
        for r in heavy_hitters_over_candidates(ev, recent, "user_id").collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    slack = CMS_EPS * n_total
    for uid, e in est.items():
        true = exact[uid]
        assert true <= e <= true + slack, (uid, e, true, slack)

"""Event analytics (operators/analytics.py): funnel ordering semantics and
cohort retention triangle."""

from __future__ import annotations

import datetime as dt

from cdc_poc_spark.operators.analytics import cohort_retention, event_funnel

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    """rows: (user, minutes_offset, type)"""
    data = [
        (u, BASE + dt.timedelta(minutes=m), t) for u, m, t in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_type string"
    )


def test_funnel_counts_ordered_users_only(spark):
    rows = [
        # u1 completes in order
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, 0, "click"), (2, 1, "view"),
        # u3 views only
        (3, 0, "view"),
        # u4 purchase without click: stops at view
        (4, 0, "view"), (4, 1, "purchase"),
        # u5 no funnel events at all
        (5, 0, "error"),
    ]
    out = {r.step_name: r for r in _ev(spark, rows).transform(event_funnel).collect()}
    assert out["any"].users_reached == 5
    assert out["view"].users_reached == 4
    assert out["click"].users_reached == 1
    assert out["purchase"].users_reached == 1
    assert out["any"].conversion_pct == 100.0
    assert out["view"].conversion_pct == 80.0
    assert out["purchase"].conversion_pct == 20.0


def test_funnel_same_timestamp_not_after(spark):
    # click at the SAME instant as the first view is not strictly after
    rows = [(1, 0, "view"), (1, 0, "click")]
    out = {r.step_name: r for r in _ev(spark, rows).transform(event_funnel).collect()}
    assert out["view"].users_reached == 1
    assert out["click"].users_reached == 0


def test_funnel_second_view_enables_click(spark):
    # first-touch: t1 is the FIRST view; a click after it counts even if an
    # earlier click existed before the first view
    rows = [(1, 0, "click"), (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase")]
    out = {r.step_name: r for r in _ev(spark, rows).transform(event_funnel).collect()}
    assert out["click"].users_reached == 1
    assert out["purchase"].users_reached == 1


def _week_ev(spark, rows):
    """rows: (user, week_offset)"""
    data = [
        (u, BASE + dt.timedelta(weeks=w, hours=1), "view") for u, w in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_type string"
    )


def test_cohort_triangle(spark):
    rows = [
        # cohort week 0: u1 active weeks 0,1,2; u2 active week 0 and 2
        (1, 0), (1, 1), (1, 2),
        (2, 0), (2, 2),
        # cohort week 1: u3 active weeks 1 only
        (3, 1),
    ]
    out = {(r.cohort_week, r.week_index): r
           for r in cohort_retention(_week_ev(spark, rows)).collect()}
    assert out[(0, 0)].n_users == 2 and out[(0, 0)].retention_pct == 100.0
    assert out[(0, 1)].n_users == 1 and out[(0, 1)].retention_pct == 50.0
    assert out[(0, 2)].n_users == 2
    assert out[(1, 0)].n_users == 1
    assert (1, 1) not in out
    # duplicate activity inside a week counts once
    rows2 = rows + [(1, 0), (1, 0)]
    out2 = {(r.cohort_week, r.week_index): r
            for r in cohort_retention(_week_ev(spark, rows2)).collect()}
    assert out2[(0, 0)].n_users == 2


def test_cohort_week_boundaries(spark):
    # day 6 is still week 0; day 7 is week 1
    data = [
        (1, BASE + dt.timedelta(days=6), "view"),
        (2, BASE + dt.timedelta(days=7), "view"),
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_type string"
    )
    out = {r.cohort_week for r in cohort_retention(df).collect()}
    assert out == {0, 1}

"""Rate-anomaly detection (operators/timeseries.py::rate_anomalies):
constructed spike/drop series and gating semantics."""

from __future__ import annotations

import datetime as dt

from cdc_poc_spark.operators.timeseries import rate_anomalies


def _events(spark, counts, event_type="t"):
    """One event row per unit of count, minute buckets 0..len(counts)-1."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, base + dt.timedelta(minutes=i, seconds=1), event_type)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string"
    )


def test_spike_on_noisy_history_flagged(spark):
    # 40 minutes alternating 9/11 (mean 10, sd 1), then a 30-count spike
    counts = [9, 11] * 20 + [30]
    out = rate_anomalies(_events(spark, counts), min_n=30).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cnt == 30
    assert r.z_score > 3
    assert abs(r.trailing_mean - 10.0) < 0.2


def test_drop_flagged_negative_z(spark):
    counts = [9, 11] * 20 + [1]
    out = rate_anomalies(_events(spark, counts), min_n=30).collect()
    assert len(out) == 1
    assert out[0].z_score < -3


def test_constant_history_any_deviation_flags(spark):
    # variance 0: the z_score is undefined (NULL) but the row must flag
    counts = [10] * 40 + [11]
    out = rate_anomalies(_events(spark, counts), min_n=30).collect()
    assert len(out) == 1
    assert out[0].z_score is None
    assert out[0].cnt == 11


def test_short_history_not_scored(spark):
    counts = [10] * 10 + [1000]
    assert rate_anomalies(_events(spark, counts), min_n=30).count() == 0


def test_inlier_not_flagged(spark):
    counts = [9, 11] * 20 + [12]  # 2 sigma: below the 3-sigma bar
    assert rate_anomalies(_events(spark, counts), min_n=30).count() == 0


def test_types_scored_independently(spark):
    a = _events(spark, [9, 11] * 20 + [30], "a")
    b = _events(spark, [9, 11] * 20 + [10], "b")
    out = rate_anomalies(a.unionByName(b), min_n=30).collect()
    assert [r.event_type for r in out] == ["a"]


def test_trend_lines_exact_fit(spark):
    """A constructed exact line y = 3x + 7 over 10 minutes must recover
    slope 3, intercept 7, r² = 1; a constant series has slope 0 and an
    undefined (NULL) r²."""
    from datetime import datetime

    from cdc_poc_spark.operators.timeseries import trend_lines

    rows = []
    for x in range(10):
        rows.append((x, datetime(2024, 1, 1, 0, x), "lin", 3.0 * x + 7.0))
        rows.append((100 + x, datetime(2024, 1, 1, 0, x), "flat", 5.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    got = {r.event_type: r for r in trend_lines(ev).collect()}
    lin = got["lin"]
    assert lin.n_minutes == 10
    assert abs(lin.slope_per_minute - 3.0) < 1e-9
    assert abs(lin.intercept - 7.0) < 1e-9
    assert abs(lin.r2 - 1.0) < 1e-9
    flat = got["flat"]
    assert flat.slope_per_minute == 0.0
    assert flat.intercept == 5.0
    assert flat.r2 is None  # zero variance -> undefined, both engines


def test_robust_trend_resists_outlier(spark):
    """Theil-Sen's point: one corrupted minute in a clean y = 2x series
    must leave the robust slope at (or very near) 2 while OLS is pulled
    away."""
    from datetime import datetime

    from cdc_poc_spark.operators.timeseries import robust_trend, trend_lines

    rows = [
        (x, datetime(2024, 1, 1, 0, x), "t", 2.0 * x) for x in range(20)
    ]
    # corrupt the LAST minute — a leverage point, so OLS slope moves hard
    rows[19] = (19, datetime(2024, 1, 1, 0, 19), "t", 1000.0)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    ts_slope = robust_trend(ev).collect()[0].theil_sen_slope
    ols_slope = trend_lines(ev).collect()[0].slope_per_minute
    assert abs(ts_slope - 2.0) < 0.2
    assert abs(ols_slope - 2.0) > 1.0  # OLS visibly dragged by the spike

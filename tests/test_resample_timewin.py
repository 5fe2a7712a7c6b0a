"""Trajectory resampling (operators/resample.py) + sliding event-time
windows (operators/timewin.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.resample import resample_track
from extractors_metadata_spark.operators.timewin import sliding_window_stats

T0 = dt.datetime(2024, 1, 1)


def _pings(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [T0 + dt.timedelta(seconds=r[1]) for r in rows],
                "event_id": list(range(len(rows))),
                "lat": [r[2] for r in rows],
                "lon": [r[3] for r in rows],
            }
        )
    )


def test_linear_interpolation_exact(spark):
    # one segment: 0 -> 10000 s, lat 33.0 -> 33.1, lon -111.0 -> -110.9
    rows = [(1, 0, 33.0, -111.0), (1, 10_000, 33.1, -110.9)]
    out = {
        r.g_us: (r.lat_e7, r.lon_e7)
        for r in resample_track(_pings(spark, rows), grid_s=3600).collect()
    }
    base = int(T0.timestamp()) * 1_000_000
    # grid hits at 3600 s and 7200 s after t0 (t0 is ON grid -> excluded,
    # half-open start), 10800 > t1
    assert set(out) == {base + 3_600_000_000, base + 7_200_000_000}
    # lat: 330000000 + round(1000000 * 3600/10000) = +360000
    assert out[base + 3_600_000_000] == (330360000, -1109640000)
    assert out[base + 7_200_000_000] == (330720000, -1109280000)


def test_gap_not_interpolated_and_on_grid_endpoint(spark):
    rows = [
        (1, 0, 33.0, -111.0),
        (1, 3600, 33.1, -111.0),     # segment ends ON grid -> emitted
        (1, 200_000, 33.5, -111.0),  # > 12 h gap -> skipped
    ]
    out = resample_track(_pings(spark, rows), grid_s=3600, max_gap_s=43_200).collect()
    base = int(T0.timestamp()) * 1_000_000
    assert [(r.g_us, r.lat_e7) for r in out] == [(base + 3_600_000_000, 331000000)]


def test_negative_delta_rounds_half_even(spark):
    # moving south/west: dq negative — signed division must floor+round
    rows = [(1, 0, 33.0002, -111.0), (1, 7200, 33.0000, -111.0004)]
    out = resample_track(_pings(spark, rows), grid_s=3600).collect()
    assert len(out) == 2  # 3600 (mid) + 7200 (endpoint on grid)
    mid = [r for r in out if r.lat_e7 not in (330002000, 330000000)][0]
    # halfway: lat 330002000 - 1000 = 330001000; lon -1110000000 - 2000
    assert (mid.lat_e7, mid.lon_e7) == (330001000, -1110002000)


def test_no_udf_plan(spark):
    rows = [(1, 0, 33.0, -111.0), (1, 3600, 33.1, -111.0)]
    plan = (
        resample_track(_pings(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _events(spark):
    rows = []
    for i in range(60):
        rows.append((i, T0 + dt.timedelta(minutes=17 * i), i % 5, "a" if i % 2 else "b", i / 4.0))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    )


def test_every_event_in_exactly_k_windows(spark):
    e = _events(spark)
    out = sliding_window_stats(e, duration="2 hours", slide="30 minutes")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 60 * 4  # d/s = 4 windows per event
    rows = out.collect()
    # window starts are slide-aligned
    assert all(r.window_start_us % 1_800_000_000 == 0 for r in rows)


def test_window_membership_is_correct(spark):
    # single event: must appear in exactly the 4 windows covering it
    e = spark.createDataFrame(
        pd.DataFrame(
            [(0, T0 + dt.timedelta(minutes=45), 1, "a", 1.0)],
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
    )
    out = sliding_window_stats(e).collect()
    t = int((T0 + dt.timedelta(minutes=45)).timestamp()) * 1_000_000
    s = 1_800_000_000
    want = {(t - t % s) - j * s for j in range(4)}
    assert {r.window_start_us for r in out} == want
    assert all(r.n_events == 1 for r in out)

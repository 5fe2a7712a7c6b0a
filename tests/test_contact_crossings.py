"""Cross-user same-hour crossing join (trajectory.contact_crossings):
closed-form X crossing, hour-blocking contract, strictness; the driver
oracle (contact_crossings) covers scale + replay."""

from __future__ import annotations

import datetime as dt


def _rows(spec):
    # spec: (user, minute, x, y) all within hour 0 unless minute >= 60
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        (u, base + dt.timedelta(minutes=m), i, x, y)
        for i, (u, m, x, y) in enumerate(spec)
    ]


def _run(spark, spec):
    from extractors_metadata_spark.operators.trajectory import contact_crossings

    df = spark.createDataFrame(
        _rows(spec), "user_id long, ts timestamp, event_id long, xi long, yi long"
    )
    return {
        (r["user_a"], r["user_b"]): r["n_crossings"]
        for r in contact_crossings(df).collect()
    }


def test_x_crossing_same_hour(spark):
    # user 1: (0,0)->(10,10); user 2: (0,10)->(10,0) — proper X
    out = _run(spark, [(1, 0, 0, 0), (1, 5, 10, 10), (2, 1, 0, 10), (2, 6, 10, 0)])
    assert out == {(1, 2): 1}


def test_different_hours_not_tested(spark):
    # same X but user 2's segment starts in hour 1 -> out of contract
    out = _run(spark, [(1, 0, 0, 0), (1, 5, 10, 10), (2, 61, 0, 10), (2, 66, 10, 0)])
    assert out == {}


def test_touching_endpoint_not_strict(spark):
    # segments share endpoint (10,10) -> collinear orientation 0 -> excluded
    out = _run(spark, [(1, 0, 0, 0), (1, 5, 10, 10), (2, 1, 10, 10), (2, 6, 20, 0)])
    assert out == {}

"""Scan-leg segmentation (operators/trajectory.py)."""

from __future__ import annotations

import datetime
import math

import pandas as pd

from extractors_metadata_spark.functions.geodesy import R_MEAN
from extractors_metadata_spark.operators.trajectory import scan_legs

DEG_PER_M = 1.0 / (math.pi / 180.0 * R_MEAN)


def _snake(spark):
    """Boustrophedon: 5 steps east, 1 north, 5 west, 1 north, 5 east —
    every step 2 m; expected legs E5 N1 W5 N1 E5."""
    lat, lon = 33.07, -111.98
    rows = []
    t = datetime.datetime(2016, 5, 7, 12, 0, 0)
    i = 0

    def emit():
        nonlocal i
        rows.append((i, t + datetime.timedelta(seconds=i), 7, lat, lon))
        i += 1

    emit()
    for _ in range(5):
        lon += 2 * DEG_PER_M
        emit()
    lat += 2 * DEG_PER_M
    emit()
    for _ in range(5):
        lon -= 2 * DEG_PER_M
        emit()
    lat += 2 * DEG_PER_M
    emit()
    for _ in range(5):
        lon += 2 * DEG_PER_M
        emit()
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "lat", "lon"])
    )


def test_boustrophedon_legs(spark):
    df = _snake(spark)
    out = sorted(
        (r.leg_id, r.dir_code, r.n_steps, r.length_cm)
        for r in scan_legs(df).collect()
    )
    # E=0 N=2 W=1 N=2 E=0
    assert [(lid, c, n) for lid, c, n, _ in out] == [
        (1, 0, 5), (2, 2, 1), (3, 1, 5), (4, 2, 1), (5, 0, 5)
    ]
    # per-leg length == reference equirect (anchored at prev lat, cm-rounded,
    # summed as exact ints) over the same point sequence
    pts = sorted(
        (r.event_id, r.lat, r.lon) for r in df.collect()
    )
    deg = math.pi / 180.0 * R_MEAN
    step_cm = []
    for (_, la0, lo0), (_, la1, lo1) in zip(pts, pts[1:]):
        dx = (lo1 - lo0) * math.cos(math.radians(la0)) * deg
        dy = (la1 - la0) * deg
        step_cm.append(round(math.sqrt(dx * dx + dy * dy) * 100.0))
    want = [
        sum(step_cm[0:5]), sum(step_cm[5:6]), sum(step_cm[6:11]),
        sum(step_cm[11:12]), sum(step_cm[12:17]),
    ]
    assert [cm for _, _, _, cm in out] == want


def test_single_point_user_emits_nothing_and_multiuser_isolated(spark):
    df = _snake(spark)
    lone = spark.createDataFrame(
        pd.DataFrame(
            [(99, datetime.datetime(2016, 5, 7), 42, 33.0, -111.0)],
            columns=["event_id", "ts", "user_id", "lat", "lon"],
        )
    )
    out = scan_legs(df.unionByName(lone)).collect()
    assert {r.user_id for r in out} == {7}
    assert sum(r.n_steps for r in out) == 17


def test_plan_shape_partial_agg_before_leg_exchange(spark):
    plan = (
        scan_legs(_snake(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one user-keyed exchange feeds both windows; the Arrow distance node
    # forces a second exchange for the (user, leg) rollup, but it must move
    # only PARTIALLY-AGGREGATED leg rows (map-side combine below it)
    assert plan.count("Exchange") == 2
    assert plan.count("Window") == 3
    leg_xchg = plan.index("Exchange hashpartitioning(user_id")
    partial = plan.index("partial_sum")
    assert partial > leg_xchg  # plan prints top-down: partial agg is BELOW
    assert plan.index("ArrowEvalPython") > leg_xchg


def test_track_diameter_pair_and_tiebreak(spark):
    """Hand pairs: {(0,0),(10,0),(0,10),(7,7)} -> diameter pair is the
    (0,10)-(10,0) diagonal (d2=200); a full square has TWO d2=200
    diagonals and the frozen tie-break picks (0,0,10,10); keys with < 2
    distinct positions are excluded (duplicates collapse)."""
    import datetime as dt

    from extractors_metadata_spark.operators.trajectory import (
        track_diameter,
    )

    def rows(u, pts):
        return [
            (u, i, dt.datetime(2016, 5, 1, 0, 0, i), x, y)
            for i, (x, y) in enumerate(pts)
        ]

    data = (
        rows(0, [(0, 0), (10, 0), (0, 10), (7, 7)])
        + rows(1, [(0, 0), (0, 10), (10, 0), (10, 10)])
        + rows(2, [(5, 5), (5, 5)])
    )
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, px long, py long"
    )
    out = {r["user_id"]: r for r in track_diameter(df).collect()}
    assert set(out) == {0, 1}
    r0 = out[0]
    assert (r0["n_pts"], r0["d2"]) == (4, 200)
    assert (r0["ax"], r0["ay"], r0["bx"], r0["by"]) == (0, 10, 10, 0)
    r1 = out[1]
    assert (r1["d2"], r1["ax"], r1["ay"], r1["bx"], r1["by"]) == (
        200, 0, 0, 10, 10,
    )

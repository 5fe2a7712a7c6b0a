"""Funnel progression + transition counts (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from extractors_metadata_spark.operators.funnel import (
    event_transitions,
    funnel_steps,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    # rows: (user, minutes, type)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [T0 + dt.timedelta(minutes=r[1]) for r in rows],
                "event_id": list(range(len(rows))),
                "event_type": [r[2] for r in rows],
            }
        )
    )


def _us(minutes):
    return (int(T0.timestamp()) + minutes * 60) * 1_000_000


def test_strict_progression(spark):
    rows = [
        (1, 0, "click"),     # click BEFORE view: must not count
        (1, 10, "view"),
        (1, 20, "click"),
        (1, 30, "purchase"),  # purchase before signup: must not count
        (1, 40, "signup"),
        (2, 0, "view"),
        (3, 0, "error"),      # non-step events only -> user absent
    ]
    out = {r.user_id: r for r in funnel_steps(_events(spark, rows)).collect()}
    r1 = out[1]
    assert (r1.t1_us, r1.t2_us, r1.t3_us, r1.t4_us) == (
        _us(10), _us(20), _us(40), None,
    )
    assert r1.steps_completed == 3
    r2 = out[2]
    assert r2.steps_completed == 1 and r2.t2_us is None
    assert 3 not in out


def test_same_timestamp_is_ineligible(spark):
    rows = [(1, 0, "view"), (1, 0, "click"), (1, 5, "click")]
    out = funnel_steps(_events(spark, rows)).collect()[0]
    # the click at t == t1 does not advance; the later one does
    assert out.t2_us == _us(5)


def test_transitions_counts(spark):
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "click"),
        (2, 0, "view"), (2, 10, "click"),
    ]
    out = {
        (r.prev_type, r.type): r.n
        for r in event_transitions(_events(spark, rows)).collect()
    }
    assert out == {("view", "click"): 2, ("click", "click"): 1}


def test_shapley_attribution_hand_coalitions(spark):
    """Journeys: A={view}, B={click,view}, C=direct, D=post-purchase
    signup (counts as direct). Hand subset sums give click 3/6,
    signup 0, view 9/6 — and the efficiency invariant
    sum = 6*(v(C) - v_empty) = 12."""
    import datetime as dt

    from extractors_metadata_spark.operators.funnel import (
        shapley_attribution,
    )

    def ev(u, i, typ):
        return (u, i, dt.datetime(2016, 5, 1, 0, 0, i), typ)

    rows = [
        ev(0, 1, "view"), ev(0, 2, "purchase"),
        ev(1, 1, "click"), ev(1, 2, "view"), ev(1, 3, "purchase"),
        ev(2, 1, "purchase"),
        ev(3, 1, "purchase"), ev(3, 2, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {r["channel"]: r for r in shapley_attribution(df).collect()}
    assert out["click"]["shapley_x6"] == 3
    assert out["signup"]["shapley_x6"] == 0
    assert out["view"]["shapley_x6"] == 9
    assert all(
        (r["n_conversions"], r["v_empty"]) == (4, 2) for r in out.values()
    )
    assert sum(r["shapley_x6"] for r in out.values()) == 12

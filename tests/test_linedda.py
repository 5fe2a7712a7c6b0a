"""Midpoint-DDA line rasterization (operators/linedda.py): hand walks,
the descending-endpoint floor rule (the truncation trap found while
building the oracle), and the D+1 cell-count invariant.

Event ids are CRT-constructed: 14092 -> cell (4,0), 14093 -> (5,0),
7185 -> (10,3)."""

from __future__ import annotations

import datetime as dt


def _run(spark, eids):
    from extractors_metadata_spark.operators.linedda import line_raster

    df = spark.createDataFrame(
        [
            (0, e, dt.datetime(2016, 5, 1, 0, 0, i))
            for i, e in enumerate(eids)
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = {}
    for r in line_raster(df).collect():
        out.setdefault(r["t"], []).append((r["s"], r["r"], r["c"]))
    return {t: sorted(v) for t, v in out.items()}


def test_dda_diagonal_walk_and_adjacent_step(spark):
    """(4,0) -> (10,3): dr=6, dc=3, D=6 -> 7 cells with the half-step
    rounding r = 4+s, c = floor((s+1)/2); then (10,3) -> one-cell
    segment stays put."""
    out = _run(spark, [14092, 7185, 7185])
    assert out[0] == [
        (0, 4, 0), (1, 5, 1), (2, 6, 1), (3, 7, 2),
        (4, 8, 2), (5, 9, 3), (6, 10, 3),
    ]
    assert out[1] == [(0, 10, 3)]


def test_dda_descending_endpoint_exact(spark):
    """(5,0) -> (4,0): the s=1 cell must be EXACTLY (4,0) — floor
    semantics; truncation toward zero would leave it at (5,0)."""
    out = _run(spark, [14093, 14092])
    assert out[0] == [(0, 5, 0), (1, 4, 0)]


def test_dda_cell_count_invariant(spark):
    """Every segment emits max(|dr|, |dc|) + 1 cells: (4,0) -> (10,3)
    gives 7, (10,3) -> (5,0) gives |dr|=5 -> 6."""
    out = _run(spark, [14092, 7185, 14093])
    assert len(out[0]) == 7
    assert len(out[1]) == 6
    assert out[1][0][1:] == (10, 3) and out[1][-1][1:] == (5, 0)

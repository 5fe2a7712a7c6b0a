"""Bounded QuickHull (operators/hull.py): exact vertex sets vs a pure-Python
monotone-chain reference; degenerate inputs; the driver oracle (convex_hull)
covers scale + the unrolled replay."""

from __future__ import annotations

import numpy as np


def _chain_hull(points):
    """Monotone-chain reference: hull VERTEX set (strict turns only)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return set(pts)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and cross(h[-2], h[-1], p) <= 0:
                h.pop()
            h.append(p)
        return h

    return set(half(pts)[:-1]) | set(half(pts[::-1])[:-1])


def _run(spark, rows):
    from extractors_metadata_spark.operators.hull import convex_hull_vertices

    df = spark.createDataFrame(rows, "user_id long, px long, py long")
    out = {}
    for r in convex_hull_vertices(df, depth=5).collect():
        out.setdefault(r["user_id"], set()).add((r["vx"], r["vy"]))
    return out


def test_square_with_interior(spark):
    rows = [(1, x, y) for x, y in [(0, 0), (10, 0), (0, 10), (10, 10), (5, 5), (3, 7), (9, 1)]]
    assert _run(spark, rows)[1] == {(0, 0), (10, 0), (0, 10), (10, 10)}


def test_matches_monotone_chain_random(spark):
    rng = np.random.default_rng(3)
    rows, expect = [], {}
    for u in (1, 2, 3):
        pts = [(int(a), int(b)) for a, b in rng.integers(-50, 50, size=(40, 2))]
        rows += [(u, x, y) for x, y in pts]
        expect[u] = _chain_hull(pts)
    got = _run(spark, rows)
    assert got == expect


def test_collinear_and_singleton(spark):
    rows = [(1, i, 2 * i) for i in range(5)] + [(2, 7, 7)]
    out = _run(spark, rows)
    assert out[1] == {(0, 0), (4, 8)}
    assert out[2] == {(7, 7)}

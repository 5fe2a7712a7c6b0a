"""Minimum enclosing circle: independent verification — coverage from
the definition plus a float Welzl reference for the radius."""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from extractors_metadata_spark.operators.mec import _mec_exact


def _welzl_r2(points):
    """Float reference MEC radius^2 (classic Welzl, shuffled)."""

    def circle2(a, b):
        cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
        r2 = (a[0] - cx) ** 2 + (a[1] - cy) ** 2
        return cx, cy, r2

    def circle3(a, b, c):
        d = 2.0 * (
            a[0] * (b[1] - c[1])
            + b[0] * (c[1] - a[1])
            + c[0] * (a[1] - b[1])
        )
        if d == 0:
            return None
        ux = (
            (a[0] ** 2 + a[1] ** 2) * (b[1] - c[1])
            + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
            + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])
        ) / d
        uy = (
            (a[0] ** 2 + a[1] ** 2) * (c[0] - b[0])
            + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
            + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])
        ) / d
        return ux, uy, (a[0] - ux) ** 2 + (a[1] - uy) ** 2

    def inside(c, p, eps=1e-7):
        return (p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2 <= c[2] * (1 + eps) + eps

    def welzl(ps):
        rng = random.Random(0)
        ps = list(ps)
        rng.shuffle(ps)
        c = None
        for i, p in enumerate(ps):
            if c is None or not inside(c, p):
                c = (p[0], p[1], 0.0)
                for j, q in enumerate(ps[:i]):
                    if not inside(c, q):
                        c = circle2(p, q)
                        for k, r in enumerate(ps[:j]):
                            if not inside(c, r):
                                c = circle3(p, q, r)
        return c[2]

    return welzl(points)


def _r2_of(pts, kind, ia, ib, ic):
    d = {i: (x, y) for i, x, y in pts}
    if kind == 2:
        a, b = d[ia], d[ib]
        return ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2) / 4.0
    a, b, c = d[ia], d[ib], d[ic]
    ab2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
    bc2 = (b[0] - c[0]) ** 2 + (b[1] - c[1]) ** 2
    ca2 = (c[0] - a[0]) ** 2 + (c[1] - a[1]) ** 2
    orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    return (ab2 * bc2 * ca2) / (4.0 * orient * orient)


@pytest.mark.parametrize("seed,n", [(2, 10), (11, 20)])
def test_matches_welzl_radius(seed, n):
    rng = np.random.RandomState(seed)
    pts = [
        (i, int(x), int(y))
        for i, (x, y) in enumerate(rng.randint(0, 3000, size=(n, 2)))
    ]
    kind, ia, ib, ic, r2_fp = _mec_exact(pts)
    got_r2 = _r2_of(pts, kind, ia, ib, ic)
    want_r2 = _welzl_r2([(x, y) for _, x, y in pts])
    assert abs(got_r2 - want_r2) <= 1e-6 * max(want_r2, 1.0)
    assert abs(got_r2 * 100 // 1 - r2_fp) <= 101  # fp = floor(r2*100)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_property_covers_and_matches_welzl(coords):
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    kind, ia, ib, ic, r2_fp = _mec_exact(pts)
    got_r2 = _r2_of(pts, kind, ia, ib, ic)
    want_r2 = _welzl_r2(coords)
    assert got_r2 <= want_r2 * (1 + 1e-6) + 1e-6  # minimality
    assert got_r2 >= want_r2 * (1 - 1e-6) - 1e-6

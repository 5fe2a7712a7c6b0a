from __future__ import annotations

import math

import pytest

from extractors_metadata_spark.operators.variogram import _half_disk, semivariogram


def test_half_disk_is_exact_half_plane():
    offs = _half_disk(5)
    seen = set()
    for dx, dy, k in offs:
        assert dy > 0 or (dy == 0 and dx > 0)
        d = math.sqrt(dx * dx + dy * dy)
        assert d <= 5.0
        assert k - 1 < d <= k or (k == 1 and d <= 1)
        assert (k - 1) ** 2 < dx * dx + dy * dy <= k * k
        seen.add((dx, dy))
        assert (-dx, -dy) not in seen  # never both orientations
    # count: half of the disk lattice points minus the origin
    full = sum(
        1
        for dx in range(-5, 6)
        for dy in range(-5, 6)
        if 0 < dx * dx + dy * dy <= 25
    )
    assert len(offs) == full // 2


def _ref(cells, n, max_lag):
    agg = {}
    pts = list(cells.items())
    for i, ((xa, ya), va) in enumerate(pts):
        for (xb, yb), vb in pts[i + 1:]:
            dx = min((xa - xb) % n, (xb - xa) % n)  # torus x distance
            # reference uses the plain difference when no wrap applies
            dxp = xa - xb
            if abs(dxp) > n // 2:
                dxp = dxp - n if dxp > 0 else dxp + n
            dy = ya - yb
            d2 = dxp * dxp + dy * dy
            if d2 > max_lag * max_lag:
                continue
            k = 1
            while k * k < d2:
                k += 1
            c, s = agg.get(k, (0, 0))
            agg[k] = (c + 1, s + (va - vb) ** 2)
    return agg


def _run(spark, cells, max_lag, z=6):
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    return {
        r["lag"]: (r["n_pairs"], r["sum_sq_diff"])
        for r in semivariogram(df, z=z, max_lag=max_lag).collect()
    }


def test_matches_all_pairs_reference(spark):
    cells = {(x, y): ((x * 3 + y * 7) % 11) + 1 for x in range(10, 16) for y in range(20, 25)}
    got = _run(spark, cells, 4)
    ref = _ref(cells, 64, 4)
    assert got == {k: v for k, v in ref.items()}


def test_shell_boundaries(spark):
    # pairs at d=1, d=sqrt(2) (lag 2), d=2 (lag 2), d=sqrt(5) (lag 3)
    cells = {(5, 5): 10, (6, 5): 7, (6, 6): 4, (7, 5): 1, (7, 6): 2}
    got = _run(spark, cells, 3)
    # lag 1: (5,5)-(6,5), (6,5)-(6,6), (6,5)-(7,5), (7,5)-(7,6), (6,6)-(7,6)
    assert got[1] == (5, 9 + 9 + 36 + 1 + 4)
    # lag 2: d in (1,2]: diag pairs (5,5)-(6,6), (6,5)-(7,6), (6,6)-(7,5) and d=2 (5,5)-(7,5)
    assert got[2] == (4, 36 + 25 + 9 + 81)
    # lag 3 (4 < d2 <= 9): only (5,5)-(7,6) at d2 = 5, sq diff (10-2)^2
    assert got[3] == (1, 64)


def test_x_wrap_pairs(spark):
    cells = {(0, 8): 5, (63, 8): 2}
    got = _run(spark, cells, 2)
    assert got == {1: (1, 9)}


def test_bad_lag_raises(spark):
    df = spark.createDataFrame([(1, 1, 1)], "x long, y long, cnt long")
    with pytest.raises(ValueError):
        semivariogram(df, z=6, max_lag=0)

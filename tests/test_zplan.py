from __future__ import annotations

import pytest

from extractors_metadata_spark.operators.zplan import z_range_plan


def _z(x: int, y: int) -> int:
    v = 0
    for b in range(16):
        v |= ((x >> b) & 1) << (2 * b)
        v |= ((y >> b) & 1) << (2 * b + 1)
    return v


def _run(spark, boxes, depth):
    df = spark.createDataFrame(
        [(k, *b) for k, b in boxes.items()],
        "key long, x0 long, x1 long, y0 long, y1 long",
    )
    out = {}
    for r in z_range_plan(df, depth=depth).collect():
        out.setdefault(r["key"], []).append((r["range_lo"], r["range_hi"]))
    return {k: sorted(v) for k, v in out.items()}


def test_union_is_exactly_the_box(spark):
    boxes = {
        1: (3, 10, 2, 9),     # generic straddler
        2: (0, 15, 0, 15),    # the full grid at depth 4
        3: (5, 5, 7, 7),      # a single cell
        4: (0, 7, 0, 7),      # an aligned quadrant
    }
    got = _run(spark, boxes, depth=4)
    for k, (x0, x1, y0, y1) in boxes.items():
        cells = {_z(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)}
        covered = set()
        for lo, hi in got[k]:
            covered.update(range(lo, hi + 1))
        assert covered == cells, k
        # ranges are disjoint, sorted, and non-adjacent (truly merged)
        rs = got[k]
        for (lo1, hi1), (lo2, hi2) in zip(rs, rs[1:]):
            assert hi1 + 1 < lo2, k


def test_aligned_quadrant_is_one_range(spark):
    got = _run(spark, {1: (0, 7, 0, 7), 2: (8, 15, 8, 15)}, depth=4)
    assert got[1] == [(0, 63)]
    assert got[2] == [(_z(8, 8), _z(8, 8) + 63)]


def test_full_grid_is_one_range(spark):
    got = _run(spark, {1: (0, 255, 0, 255)}, depth=8)
    assert got[1] == [(0, 65535)]


def test_range_count_stays_bounded(spark):
    # O(D * perimeter) bound: a 100x1 sliver at depth 8 must not blow up
    got = _run(spark, {1: (10, 109, 77, 77)}, depth=8)
    n = len(got[1])
    assert sum(hi - lo + 1 for lo, hi in got[1]) == 100
    assert n <= 100  # and far fewer ranges than a naive per-cell plan
    assert n < 60


def test_bad_depth_raises(spark):
    df = spark.createDataFrame([(1, 0, 1, 0, 1)], "key long, x0 long, x1 long, y0 long, y1 long")
    with pytest.raises(ValueError):
        z_range_plan(df, depth=0)

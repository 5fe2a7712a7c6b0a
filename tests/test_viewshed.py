from __future__ import annotations

from extractors_metadata_spark.operators.viewshed import viewshed


def _run(spark, cells, ox, oy, **kw):
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    return {
        (r["x"], r["y"]): (r["visible"], r["steps"])
        for r in viewshed(df, z=6, obs_x=ox, obs_y=oy, **kw).collect()
    }


def test_ridge_blocks_lowland_behind(spark):
    # observer h=10 at x=0; ridge h=20 at x=3; target h=1 at x=6 is hidden
    # (ridge above the sightline), but a tall tower h=50 at x=8 is visible
    cells = {(0, 5): 10, (3, 5): 20, (6, 5): 1, (8, 5): 50}
    got = _run(spark, cells, 0, 5)
    assert got[(3, 5)][0] is True  # the ridge itself is visible
    assert got[(6, 5)][0] is False
    assert got[(8, 5)][0] is True


def test_empty_cells_are_zero_elevation(spark):
    # downhill target: the zero-elevation gap can still block a sightline
    # that dips below zero, but not one that stays above
    cells = {(0, 5): 10, (4, 5): 4}  # sightline at t=1..3 is >= 4 > 0
    got = _run(spark, cells, 0, 5)
    assert got[(4, 5)][0] is True
    # target far below: sightline from 10 down to -20-ish would dip under 0
    cells = {(0, 5): 2, (6, 5): 1}
    # slope (1-2)/6; at t=3 sightline height = 2 - 0.5 = 1.5 > 0 -> visible
    got = _run(spark, cells, 0, 5)
    assert got[(6, 5)][0] is True


def test_adjacent_always_visible_and_self_excluded(spark):
    cells = {(5, 5): 3, (6, 5): 100, (6, 6): 1, (4, 4): 50}
    got = _run(spark, cells, 5, 5)
    assert set(got) == {(6, 5), (6, 6), (4, 4)}  # observer not a target
    assert all(v for v, _ in got.values())  # L=1: no intermediate samples


def test_diagonal_ray_sampling(spark):
    # observer (0,0) h=10, wall at (2,2) h=30, target (4,4) h=5: the exact
    # diagonal samples pass through the wall -> hidden
    cells = {(0, 0): 10, (2, 2): 30, (4, 4): 5}
    got = _run(spark, cells, 0, 0)
    assert got[(2, 2)][0] is True
    assert got[(4, 4)][0] is False
    assert got[(4, 4)][1] == 4  # steps = chebyshev distance


def test_equal_height_at_sightline_blocks(spark):
    # blocker exactly ON the sightline (>= rule): obs 10, mid 10, tgt 10
    cells = {(0, 5): 10, (2, 5): 10, (4, 5): 10}
    got = _run(spark, cells, 0, 5)
    assert got[(4, 5)][0] is False
    assert got[(2, 5)][0] is True


def test_max_steps_bounds_targets(spark):
    cells = {(0, 5): 10, (2, 5): 1, (9, 5): 1}
    got = _run(spark, cells, 0, 5, max_steps=5)
    assert set(got) == {(2, 5)}


def test_partitioning_invariance(spark):
    cells = {(x, y): ((x * 5 + y * 3) % 13) + 1 for x in range(10) for y in range(8)}
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    a = {(r["x"], r["y"]): r["visible"] for r in viewshed(df.coalesce(1), z=6, obs_x=5, obs_y=4).collect()}
    b = {(r["x"], r["y"]): r["visible"] for r in viewshed(df.repartition(16), z=6, obs_x=5, obs_y=4).collect()}
    assert a == b

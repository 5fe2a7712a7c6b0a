from __future__ import annotations

import pytest

from extractors_metadata_spark.operators.d8flow import _DIRS, d8_flow, watershed


def _ref(cells: dict[tuple[int, int], int], n: int):
    """Brute-force D8 reference: steepest strictly-lower occupied
    neighbor (steep2 desc, dir asc), then path-walk accumulation."""
    nxt = {}
    dirs = {}
    for (x, y), c in cells.items():
        best = None
        for d, dx, dy in _DIRS:
            p = ((x + dx) % n, y + dy)
            if not (0 <= p[1] < n) or p not in cells or cells[p] >= c:
                continue
            drop = c - cells[p]
            s2 = drop * drop * (2 if dx * dy == 0 else 1)
            key = (-s2, d)
            if best is None or key < best[0]:
                best = (key, d, p)
        if best is None:
            dirs[(x, y)] = -1
        else:
            dirs[(x, y)] = best[1]
            nxt[(x, y)] = best[2]
    acc = {k: 0 for k in cells}
    for start in cells:
        cur = start
        while True:
            acc[cur] += 1
            if cur not in nxt:
                break
            cur = nxt[cur]
    return dirs, acc


def _run(spark, cells, z, **kw):
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    return {
        (r["x"], r["y"]): (r["dir"], r["acc"], r["cnt"])
        for r in d8_flow(df, z=z, **kw).collect()
    }


def test_matches_brute_reference(spark):
    # a little valley: counts descend toward (12, 12)
    cells = {
        (x, y): abs(x - 12) * 3 + abs(y - 12) * 2 + 1
        for x in range(9, 16)
        for y in range(10, 15)
    }
    cells[(9, 10)] = 50  # a peak
    cells[(15, 14)] = 1  # a co-minimum -> second basin sink
    got = _run(spark, cells, z=6)
    dirs, acc = _ref(cells, 64)
    assert set(got) == set(cells)
    for k in cells:
        assert got[k][0] == dirs[k], k
        assert got[k][1] == acc[k], k
        assert got[k][2] == cells[k]


def test_sink_and_tiebreaks(spark):
    # isolated cell: sink with acc 1
    got = _run(spark, {(5, 5): 7}, z=6)
    assert got[(5, 5)] == (-1, 1, 7)
    # equal drops on +x and +y: orthogonal tie -> smallest dir index (0)
    cells = {(5, 5): 9, (6, 5): 4, (5, 6): 4}
    got = _run(spark, cells, z=6)
    assert got[(5, 5)][0] == 0
    # 2*do^2 vs dd^2 boundary: drop 5 orth (steep2 50) vs drop 7 diag
    # (steep2 49) -> orthogonal wins; drop 8 diag (steep2 64) wins
    got = _run(spark, {(5, 5): 10, (6, 5): 5, (6, 6): 3}, z=6)
    assert got[(5, 5)][0] == 0
    got = _run(spark, {(5, 5): 10, (6, 5): 5, (6, 6): 2}, z=6)
    assert got[(5, 5)][0] == 1
    # strict descent: an equal-count neighbor is NOT a candidate
    got = _run(spark, {(5, 5): 4, (6, 5): 4}, z=6)
    assert got[(5, 5)][0] == -1 and got[(6, 5)][0] == -1


def test_x_wrap_and_pole_clip(spark):
    n = 64
    # flow crosses the antimeridian: x=0 drains to x=63
    got = _run(spark, {(0, 8): 9, (n - 1, 8): 2}, z=6)
    assert got[(0, 8)][0] == 4 and got[(n - 1, 8)][1] == 2
    # y=0 cell: the three -y offsets clip; drains sideways instead
    got = _run(spark, {(5, 0): 9, (6, 0): 3}, z=6)
    assert got[(5, 0)][0] == 0


def test_accumulation_chain_and_confluence(spark):
    # chain 5 -> 4 -> 3 -> 2 -> 1 plus a tributary joining at the 3
    cells = {(10, 5): 5, (11, 5): 4, (12, 5): 3, (13, 5): 2, (14, 5): 1,
             (12, 4): 6}
    got = _run(spark, cells, z=6)
    assert got[(14, 5)][1] == 6  # everything drains here
    assert got[(12, 5)][1] == 4  # chain head + 2 upstream + tributary
    assert got[(12, 4)] == (2, 1, 6)  # tributary is a ridge cell


def test_nonconvergence_raises(spark):
    cells = {(x, 5): 10 - x for x in range(8)}  # path length 7
    with pytest.raises(ValueError, match="did not converge"):
        _run(spark, cells, z=6, rounds=3)


def _ref_basins(cells: dict[tuple[int, int], int], n: int):
    dirs, _ = _ref(cells, n)
    nxt = {}
    for (x, y), d in dirs.items():
        if d == -1:
            continue
        _, dx, dy = _DIRS[d]
        nxt[(x, y)] = ((x + dx) % n, y + dy)
    sink = {}
    for start in cells:
        cur = start
        while cur in nxt:
            cur = nxt[cur]
        sink[start] = cur
    sizes = {}
    for s in sink.values():
        sizes[s] = sizes.get(s, 0) + 1
    return sink, sizes


def test_watershed_matches_walk_reference(spark):
    cells = {
        (x, y): abs(x - 12) * 3 + abs(y - 12) * 2 + 1
        for x in range(9, 16)
        for y in range(10, 15)
    }
    cells[(20, 20)] = 3  # an isolated second basin
    cells[(21, 20)] = 9
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    got = {
        (r["x"], r["y"]): ((r["sink_x"], r["sink_y"]), r["basin_n"])
        for r in watershed(df, z=6).collect()
    }
    sink, sizes = _ref_basins(cells, 64)
    assert set(got) == set(cells)
    for k in cells:
        assert got[k][0] == sink[k], k
        assert got[k][1] == sizes[sink[k]], k
    # the valley floor collects everything except the isolated basin
    assert got[(12, 12)][1] == len(cells) - 2
    assert got[(20, 20)] == ((20, 20), 2)


def test_watershed_long_chain_log_rounds(spark):
    # a 33-cell monotone chain: pointer doubling needs ceil(log2 32) = 5
    # doubling rounds (+1 to observe stability) — rounds=6 must suffice,
    # rounds=4 must raise
    cells = {(x, 5): 40 - x for x in range(33)}
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    got = {
        (r["x"], r["y"]): (r["sink_x"], r["sink_y"], r["basin_n"])
        for r in watershed(df, z=6, rounds=6).collect()
    }
    assert all(v == (32, 5, 33) for v in got.values())
    with pytest.raises(ValueError, match="did not settle"):
        watershed(df, z=6, rounds=4).collect()


def test_partitioning_invariance(spark):
    cells = {
        (x, y): ((x * 7 + y * 13) % 23) + 1 for x in range(20, 36) for y in range(20, 30)
    }
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    a = {(r["x"], r["y"]): (r["dir"], r["acc"]) for r in d8_flow(df.coalesce(1), z=6).collect()}
    b = {(r["x"], r["y"]): (r["dir"], r["acc"]) for r in d8_flow(df.repartition(16), z=6).collect()}
    assert a == b

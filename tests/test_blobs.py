from __future__ import annotations

from extractors_metadata_spark.operators.blobs import tile_blobs


def _ref(cells: dict[tuple[int, int], int], n: int):
    """Flood-fill reference: 8-connected components, min-(x,y) label."""
    seen = {}
    for start in sorted(cells):
        if start in seen:
            continue
        comp = [start]
        seen[start] = None
        stack = [start]
        while stack:
            x, y = stack.pop()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    p = ((x + dx) % n, y + dy)
                    if 0 <= p[1] < n and p in cells and p not in seen:
                        seen[p] = None
                        comp.append(p)
                        stack.append(p)
        lbl = min(comp)
        for c in comp:
            seen[c] = (lbl, len(comp), sum(cells[m] for m in comp))
    return seen


def _run(spark, cells, z=6):
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, cnt long"
    )
    return {
        (r["x"], r["y"]): (
            (r["blob_x"], r["blob_y"]),
            r["blob_n"],
            r["blob_mass"],
            r["is_boundary"],
        )
        for r in tile_blobs(df, z=z).collect()
    }


def test_multi_blob_matches_flood_fill(spark):
    cells = {}
    # blob A: a 3x3 square
    for x in range(4, 7):
        for y in range(4, 7):
            cells[(x, y)] = x + y
    # blob B: a diagonal chain (8-connectivity joins it)
    for i in range(5):
        cells[(20 + i, 20 + i)] = 1
    # blob C: an isolated cell
    cells[(40, 2)] = 9
    got = _run(spark, cells)
    ref = _ref(cells, 64)
    assert set(got) == set(cells)
    for k in cells:
        lbl, cnt, mass = ref[k]
        assert got[k][0] == lbl, k
        assert got[k][1] == cnt, k
        assert got[k][2] == mass, k


def test_boundary_flag(spark):
    # 3x3 square: the center cell has all 8 neighbors -> interior
    cells = {(x, y): 1 for x in range(4, 7) for y in range(4, 7)}
    got = _run(spark, cells)
    assert got[(5, 5)][3] is False
    for k in cells:
        if k != (5, 5):
            assert got[k][3] is True, k


def test_x_wrap_joins_blobs(spark):
    # cells at x = 0 and x = n-1 are adjacent through the antimeridian
    cells = {(0, 8): 2, (63, 8): 3}
    got = _run(spark, cells)
    assert got[(0, 8)][1] == 2 and got[(0, 8)][2] == 5
    assert got[(0, 8)][0] == got[(63, 8)][0] == (0, 8)


def test_singletons_are_their_own_blob(spark):
    cells = {(1, 1): 5, (10, 10): 7}
    got = _run(spark, cells)
    assert got[(1, 1)] == ((1, 1), 1, 5, True)
    assert got[(10, 10)] == ((10, 10), 1, 7, True)

from __future__ import annotations

from extractors_metadata_spark.operators.spatial_autocorr import local_moran


def _rows(spark, data):
    return spark.createDataFrame(data, "cx long, cy long, x long")


def test_isolated_and_paired_cells(spark):
    out = {
        (r.cx, r.cy): (r.x, r.w_deg, r.lag)
        for r in local_moran(
            _rows(spark, [(0, 0, 5), (0, 1, 7), (5, 5, 3)])
        ).collect()
    }
    assert out == {
        (0, 0): (5, 1, 7),   # one existing neighbor: (0,1)
        (0, 1): (7, 1, 5),
        (5, 5): (3, 0, 0),   # isolated cell: zero degree, zero lag
    }


def test_full_queen_block(spark):
    # 3x3 block, x = 10*cx + cy + 1 so every value is distinct
    data = [(cx, cy, 10 * cx + cy + 1) for cx in range(3) for cy in range(3)]
    out = {
        (r.cx, r.cy): (r.w_deg, r.lag)
        for r in local_moran(_rows(spark, data)).collect()
    }
    val = {(cx, cy): x for cx, cy, x in data}

    def expect(cx, cy):
        nbrs = [
            val[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in val
        ]
        return (len(nbrs), sum(nbrs))

    assert out == {c: expect(*c) for c in val}
    # center touches all 8; corners touch 3; edges touch 5
    assert out[(1, 1)][0] == 8
    assert out[(0, 0)][0] == 3
    assert out[(1, 0)][0] == 5
    # every directed adjacency is counted once on each side
    assert sum(w for w, _ in out.values()) % 2 == 0


def test_phantom_neighbors_not_emitted(spark):
    # neighbors-of-real-cells that hold no points must not appear as rows
    out = local_moran(_rows(spark, [(2, 2, 9)])).collect()
    assert len(out) == 1 and out[0].w_deg == 0 and out[0].lag == 0


def test_join_counts_single_black_cell(spark):
    """Four events at event_id 0 -> only cell (0,0) is black (864*4 >=
    4; empty cells fail 0 >= 4). Its two rook edges are BW; the other
    1656 are WW; expectations follow the hypergeometric closed form."""
    import datetime as dt

    from extractors_metadata_spark.operators.spatial_autocorr import (
        join_counts,
    )

    df = spark.createDataFrame(
        [(u, 0, dt.datetime(2016, 5, 1)) for u in range(4)],
        "user_id long, event_id long, ts timestamp",
    )
    r = join_counts(df).collect()[0]
    assert (r["n_cells"], r["n_edges"], r["n_black"]) == (864, 1658, 1)
    assert (r["bb"], r["ww"], r["bw"]) == (0, 1656, 2)
    assert r["e_bb_num"] == 0
    assert r["e_ww_num"] == 1658 * 863 * 862
    assert r["e_bw_num"] == 2 * 1658 * 863
    assert r["e_den"] == 864 * 863


def test_marching_squares_single_cell_and_saddle(spark):
    """Two diagonal black cells (0,0) and (1,1) (event ids 0 / 9019, two
    each): block (0,0) is the SADDLE (case 5, two segments); its three
    neighbors each carry one crossing; nothing else emits."""
    import datetime as dt

    from extractors_metadata_spark.operators.spatial_autocorr import (
        marching_squares,
    )

    df = spark.createDataFrame(
        [(u, e, dt.datetime(2016, 5, 1)) for u, e in
         [(0, 0), (1, 0), (2, 9019), (3, 9019)]],
        "user_id long, event_id long, ts timestamp",
    )
    out = {
        (r["r"], r["c"]): (r["case_idx"], r["n_segments"])
        for r in marching_squares(df).collect()
    }
    assert out[(0, 0)] == (5, 2)
    assert out[(0, 1)] == (8, 1)
    assert out[(1, 0)] == (2, 1)
    assert out[(1, 1)] == (1, 1)
    assert len(out) == 4


def test_geary_c_single_hot_cell(spark):
    """Four events in cell (0,0): sum_dx2 = two rook edges x 4^2 = 32;
    the n-scaled rational follows the closed form."""
    import datetime as dt

    from extractors_metadata_spark.operators.spatial_autocorr import (
        geary_c,
    )

    df = spark.createDataFrame(
        [(u, 0, dt.datetime(2016, 5, 1)) for u in range(4)],
        "user_id long, event_id long, ts timestamp",
    )
    r = geary_c(df).collect()[0]
    assert (r["n_cells"], r["n_edges"]) == (864, 1658)
    assert (r["sum_x"], r["sum_x2"], r["sum_dx2"]) == (4, 16, 32)
    assert r["c_num"] == 864 * 863 * 32
    assert r["c_den"] == 2 * 1658 * (864 * 16 - 16)


def test_jenks_breaks_isolates_the_hot_cell(spark):
    """One hot cell (value 4) among 863 zeros: every class can be made
    pure so total cost is 0; the smaller-break tie cascade pins breaks
    [0,1,2,3,863,864] and the top class isolates the hot cell."""
    import datetime as dt

    from extractors_metadata_spark.operators.jenks import jenks_breaks

    df = spark.createDataFrame(
        [(u, 0, dt.datetime(2016, 5, 1)) for u in range(4)],
        "user_id long, event_id long, ts timestamp",
    )
    out = {r["cls"]: r for r in jenks_breaks(df, k=5).collect()}
    assert [out[t]["start_idx"] for t in range(1, 6)] == [0, 1, 2, 3, 863]
    assert out[5]["end_idx"] == 864
    assert (out[5]["lo_value"], out[5]["hi_value"], out[5]["n_in_class"]) \
        == (4, 4, 1)
    assert all(r["total_cost_fp"] == 0 for r in out.values())
    assert sum(r["n_in_class"] for r in out.values()) == 864

"""STR bulk-load packing (operators/strpack.py): the hand 3x3 grid at
cap=2 (L=5 leaves, S=3 slices) and the empty-input schema."""

from __future__ import annotations


def test_str_pack_hand_grid(spark):
    """9 grid points, cap 2: slices cut the x-order every S*cap=6, each
    slice y-sorted and cut every 2 -> leaf MBRs pinned by hand."""
    from extractors_metadata_spark.operators.strpack import str_pack

    pts = [(i, x, y) for i, (x, y) in enumerate(
        [(x, y) for x in (0, 10, 20) for y in (0, 10, 20)]
    )]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = {r["leaf_id"]: r for r in str_pack(df, cap=2).collect()}
    assert sum(r["n_pts"] for r in out.values()) == 9
    assert set(out) == {0, 1, 2, 3, 4}
    # slice 0 holds the x in {0, 10} columns; its first y-leaf is the
    # y=0 row pair
    r0 = out[0]
    assert (r0["n_pts"], r0["min_x"], r0["max_x"], r0["min_y"],
            r0["max_y"]) == (2, 0, 10, 0, 0)
    assert (out[2]["min_y"], out[2]["max_y"]) == (20, 20)
    # slice 1 (x = 20) packs 2 + 1
    assert (out[3]["n_pts"], out[4]["n_pts"]) == (2, 1)
    assert (out[4]["min_x"], out[4]["min_y"]) == (20, 20)


def test_str_pack_empty(spark):
    from extractors_metadata_spark.operators.strpack import str_pack

    df = spark.createDataFrame([], "id long, x long, y long")
    assert str_pack(df).count() == 0

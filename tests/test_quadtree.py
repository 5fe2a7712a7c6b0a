"""Adaptive quadtree binning (operators/quadtree.py): partition + cap
invariants on the sf0.001 events table and a closed-form dense/sparse
fixture; the driver oracle (quadtree) covers the exact cross-engine replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def leaves(spark):
    from extractors_metadata_spark.operators.quadtree import quadtree_leaves

    lat = (
        F.lit(33.0745)
        + ((F.col("event_id") % 1000).cast("double") + F.lit(0.5))
        / F.lit(1000.0) * F.lit(54.0) * F.lit(0.0000365)
    ).alias("lat")
    lon = (
        F.lit(-111.9750833333)
        + ((F.col("event_id") % 640).cast("double") + F.lit(0.5))
        / F.lit(640.0) * F.lit(16.0) * F.lit(0.00005)
    ).alias("lon")
    pts = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id").select(lat, lon)
    )
    return quadtree_leaves(pts, z_min=18, z_max=24, cap=40).collect(), pts.count()


def test_leaves_partition_all_points(leaves):
    rows, total = leaves
    assert sum(r["n_points"] for r in rows) == total


def test_leaves_respect_cap_except_at_zmax(leaves):
    rows, _ = leaves
    for r in rows:
        assert r["n_points"] <= 40 or r["z"] == 24


def test_leaves_are_disjoint_across_levels(leaves):
    # no leaf is an ancestor of another leaf (disjoint cover)
    rows, _ = leaves
    cells = {(r["z"], r["x"], r["y"]) for r in rows}
    for z, x, y in cells:
        for za in range(18, z):
            assert (za, x >> (z - za), y >> (z - za)) not in cells


def test_dense_cell_splits_sparse_stays(spark):
    from extractors_metadata_spark.operators.quadtree import quadtree_leaves

    # 50 points on one spot (splits to z_max), 3 on another (stays at z_min)
    rows = [(10.0005, 10.0005)] * 50 + [(-40.0, -40.0)] * 3
    pts = spark.createDataFrame(rows, "lat double, lon double")
    out = quadtree_leaves(pts, z_min=4, z_max=8, cap=10).collect()
    by_z = {}
    for r in out:
        by_z.setdefault(r["z"], 0)
        by_z[r["z"]] += r["n_points"]
    assert by_z == {4: 3, 8: 50}

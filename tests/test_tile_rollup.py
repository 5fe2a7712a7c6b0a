"""Tile pyramid rollup (operators/tile_rollup.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.functions.tiles import tile_xyz
from extractors_metadata_spark.operators.tile_rollup import tile_pyramid


def _points_df(spark, n=400, seed_mult=37):
    # deterministic lat/lon cloud spanning a few z12 tiles
    i = np.arange(n)
    lat = 33.07 + ((i * seed_mult) % 1000) / 1000.0 * 0.02
    lon = -111.98 + ((i * (seed_mult + 4)) % 640) / 640.0 * 0.03
    x, y = tile_xyz(lat, lon, 16)
    return spark.createDataFrame(
        pd.DataFrame({"x": x, "y": y, "value_fp": (i % 7).astype("int64")})
    )


def test_rollup_equals_direct_every_level(spark):
    """Cascade (re-aggregate previous level) == direct aggregation at each
    z via the shift identity — the core pyramid invariant."""
    pts = _points_df(spark)
    out, caches = tile_pyramid(pts, z_max=16, z_min=12, value_fp_col="value_fp")
    got = {
        (r.z, r.x, r.y): (r.n_points, r.sum_fp) for r in out.collect()
    }
    pdf = pts.toPandas()
    for z in range(12, 17):
        shift = 16 - z
        gx = pdf.x.to_numpy() >> shift
        gy = pdf.y.to_numpy() >> shift
        direct = (
            pd.DataFrame({"x": gx, "y": gy, "v": pdf.value_fp})
            .groupby(["x", "y"])
            .agg(n=("v", "size"), s=("v", "sum"))
        )
        for (xx, yy), row in direct.iterrows():
            assert got[(z, xx, yy)] == (row.n, row.s)
        assert sum(1 for k in got if k[0] == z) == len(direct)
    for c in caches:
        c.unpersist()


def test_halving_identity_matches_fresh_assignment(spark):
    """parent(x, y) >> 1 at z-1 equals assigning the raw lat/lon at z-1
    directly (the floating-point halving-exactness claim)."""
    i = np.arange(1000)
    lat = 33.0 + (i % 997) / 997.0 * 0.5
    lon = -112.0 + (i % 641) / 641.0 * 0.5
    for z in (20, 16, 9):
        x1, y1 = tile_xyz(lat, lon, z)
        x0, y0 = tile_xyz(lat, lon, z - 1)
        assert np.array_equal(x1 >> 1, x0)
        assert np.array_equal(y1 >> 1, y0)


def test_mass_conservation_and_level_counts(spark):
    pts = _points_df(spark, n=250)
    out, caches = tile_pyramid(pts, z_max=16, z_min=10, value_fp_col="value_fp")
    agg = (
        out.groupBy("z")
        .agg(F.sum("n_points").alias("n"), F.sum("sum_fp").alias("s"))
        .collect()
    )
    total = pts.count()
    total_v = pts.agg(F.sum("value_fp")).collect()[0][0]
    assert len(agg) == 7
    for r in agg:  # every level re-partitions the same mass
        assert r.n == total and r.s == total_v
    for c in caches:
        c.unpersist()


def test_plan_shape_no_udf_one_exchange_per_level(spark):
    """The cascade is pure codegen (shiftright) — no Python eval — and each
    level adds exactly one aggregate Exchange over the SHRUNKEN frame."""
    pts = _points_df(spark, n=50)
    out, caches = tile_pyramid(pts, z_max=14, z_min=12, value_fp_col="value_fp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    for c in caches:
        c.unpersist()

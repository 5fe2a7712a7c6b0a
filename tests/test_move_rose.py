"""Octant classification (trajectory.octant_sector): boundary-exact."""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.trajectory import octant_sector


def _classify(spark, vecs):
    df = spark.createDataFrame(pd.DataFrame(vecs, columns=["dx", "dy"]))
    rows = df.select(
        "dx", "dy", octant_sector(F.col("dx"), F.col("dy")).alias("s")
    ).collect()
    return {(r.dx, r.dy): r.s for r in rows}


def test_sector_centers(spark):
    # one vector ~22.5 deg inside each octant; expected = floor(angle/45)
    centers = []
    for k in range(8):
        ang = math.radians(k * 45 + 22.5)
        centers.append((round(1000 * math.cos(ang)), round(1000 * math.sin(ang))))
    got = _classify(spark, centers)
    for k, v in enumerate(centers):
        assert got[v] == k, (k, v)


def test_sector_boundaries_half_open(spark):
    # boundary rays at k*45 deg belong to sector k (half-open lower edge)
    boundary = {
        (5, 0): 0, (5, 5): 1, (0, 5): 2, (-5, 5): 3,
        (-5, 0): 4, (-5, -5): 5, (0, -5): 6, (5, -5): 7,
    }
    got = _classify(spark, list(boundary))
    assert got == boundary

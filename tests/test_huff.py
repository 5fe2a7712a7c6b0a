"""Huff model hand goldens over a tiny synthetic plot grid."""

import numpy as np
import pandas as pd


def _plots():
    """Three small rects west of the probe point, in the plot_rings dim
    format (plot_id + closed ring + res-9 covering cells)."""
    from extractors_metadata_spark.functions import hexgrid

    rows = []
    for i, lon_w in enumerate([-111.0005, -111.0010, -111.0020]):
        lat_s, lat_n = 32.9999, 33.0001
        lon_e = lon_w + 0.0002
        ring = [[lon_w, lat_s], [lon_e, lat_s], [lon_e, lat_n],
                [lon_w, lat_n], [lon_w, lat_s]]
        rows.append({
            "plot_id": f"p{i+1}",
            "ring": ring,
            "cells": hexgrid.polyfill(np.array(ring), 9).tolist(),
        })
    return pd.DataFrame(rows)


def test_huff_mass_partition_and_order(spark):
    """One point east of three aligned rects: nearest gets the largest
    share; p sums to exactly 1 (num_1+num_2+num_3 == den)."""
    from extractors_metadata_spark.operators.huff import huff_model

    pts = spark.createDataFrame(
        [(1, 33.0, -111.0000)], "event_id long, centroid_lat double, centroid_lon double"
    )
    r = huff_model(spark, pts, _plots()).collect()[0]
    assert (r["plot_1"], r["plot_2"], r["plot_3"]) == ("p1", "p2", "p3")
    assert r["num_1"] + r["num_2"] + r["num_3"] == r["den"]
    assert r["num_1"] > r["num_2"] > r["num_3"]
    assert r["d2_1"] < r["d2_2"] < r["d2_3"]


def test_huff_on_site_clamp(spark):
    """A point INSIDE the nearest plot has dist 0 -> d2 clamps to 1 and
    that site takes essentially the whole mass."""
    from extractors_metadata_spark.operators.huff import huff_model

    pts = spark.createDataFrame(
        [(1, 33.0, -111.0004)], "event_id long, centroid_lat double, centroid_lon double"
    )
    r = huff_model(spark, pts, _plots()).collect()[0]
    assert r["d2_1"] == 1
    assert r["num_1"] == r["d2_2"] * r["d2_3"]
    assert r["num_1"] > 1000 * (r["num_2"] + r["num_3"])

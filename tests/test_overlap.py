"""Polygon x bbox overlap join (operators/overlap.py) + the box-cover and
rect_overlap kernels under it."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _prep(rings, ids=None):
    from extractors_metadata_spark.operators.geometry import PreparedPolygons

    pdf = pd.DataFrame(
        {
            "plot_id": ids or [f"p{i}" for i in range(len(rings))],
            "ring": [np.asarray(r, dtype=np.float64) for r in rings],
        }
    )
    return pdf, PreparedPolygons.from_pandas(pdf)


def test_bbox_cells_batch_covers_interior_points():
    from extractors_metadata_spark.functions import hexgrid

    rng = np.random.default_rng(7)
    n = 200
    lat0 = 33.07 + rng.uniform(0, 0.01, n)
    lon0 = -111.98 + rng.uniform(0, 0.01, n)
    dlat = rng.uniform(1e-5, 4e-4, n)
    dlon = rng.uniform(1e-5, 4e-4, n)
    for res in (10, 12, 13):
        idx, cells = hexgrid.bbox_cells_batch(lat0, lon0, lat0 + dlat, lon0 + dlon, res)
        # random interior points of each box must encode into its cell set
        u, v = rng.uniform(0, 1, (2, n))
        enc = hexgrid.h3_encode(lat0 + u * dlat, lon0 + v * dlon, res)
        for i in range(n):
            assert enc[i] in set(cells[idx == i]), (res, i)


def test_rect_overlap_plus_sign_and_touch():
    # thin rotated strip through the middle of a square: NO vertex of either
    # shape inside the other — only the edge-intersection branch catches it
    strip = [[0.0, 0.45], [1.0, 0.55], [1.0, 0.6], [0.0, 0.5]]
    _, prep = _prep([strip])
    idx = np.zeros(4, dtype=np.int64)
    min_x = np.array([0.4, 2.0, 1.0, 0.4])
    min_y = np.array([0.0, 0.0, 0.575, 0.0])
    max_x = np.array([0.6, 3.0, 2.0, 0.6])
    max_y = np.array([1.0, 1.0, 1.0, 0.2])
    got = prep.rect_overlap(idx, min_x, min_y, max_x, max_y)
    # [0] plus-sign cross; [1] disjoint right; [2] touches the strip's
    # (1.0, 0.575) right edge midpoint exactly; [3] below the strip
    assert got.tolist() == [True, False, True, False]


def test_rect_overlap_rect_inside_poly_and_reverse():
    square = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
    _, prep = _prep([square])
    idx = np.zeros(2, dtype=np.int64)
    # tiny rect fully inside (only corner-in-poly fires); huge rect fully
    # containing the square (only vertex-in-rect fires)
    got = prep.rect_overlap(
        idx,
        np.array([4.0, -5.0]), np.array([4.0, -5.0]),
        np.array([5.0, 15.0]), np.array([5.0, 15.0]),
    )
    assert got.tolist() == [True, True]


def test_bbox_overlap_join_matches_bruteforce(spark):
    from extractors_metadata_spark.operators.overlap import bbox_overlap_join

    # 6x6 grid of axis-aligned plots ~40x50 m at Maricopa scale
    rings, ids = [], []
    for r in range(6):
        for p in range(6):
            s, w = 33.07 + r * 4e-4, -111.98 + p * 5e-4
            rings.append([[w, s], [w + 5e-4, s], [w + 5e-4, s + 4e-4], [w, s + 4e-4]])
            ids.append(f"{r}-{p}")
    pdf, _ = _prep(rings, ids)

    rng = np.random.default_rng(3)
    n = 300
    lat0 = 33.07 + rng.uniform(-3e-4, 6 * 4e-4, n)
    lon0 = -111.98 + rng.uniform(-4e-4, 6 * 5e-4, n)
    dlat = rng.uniform(1e-5, 6e-4, n)
    dlon = rng.uniform(1e-5, 8e-4, n)
    boxes = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": np.arange(n),
                "min_lat": lat0, "min_lon": lon0,
                "max_lat": lat0 + dlat, "max_lon": lon0 + dlon,
            }
        )
    )
    got = {
        (r["event_id"], r["plot_id"])
        for r in bbox_overlap_join(spark, boxes, pdf).collect()
    }
    want = set()
    for i in range(n):
        for j, ring in enumerate(rings):
            xs = [v[0] for v in ring]
            ys = [v[1] for v in ring]
            if (
                lat0[i] <= max(ys) and lat0[i] + dlat[i] >= min(ys)
                and lon0[i] <= max(xs) and lon0[i] + dlon[i] >= min(xs)
            ):
                want.add((i, ids[j]))
    assert got == want

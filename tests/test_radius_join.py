"""Within-radius point self-join (operators/radius_join.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _brute(df: pd.DataFrame, radius_m: float):
    from extractors_metadata_spark.functions.geodesy import R_MEAN

    deg = math.pi / 180.0 * R_MEAN
    want = set()
    rows = df.to_dict("records")
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            lo, hi = (a, b) if a["event_id"] < b["event_id"] else (b, a)
            dx = (hi["lon"] - lo["lon"]) * math.cos(math.radians(lo["lat"])) * deg
            dy = (hi["lat"] - lo["lat"]) * deg
            d = round(math.sqrt(dx * dx + dy * dy), 2)
            if d <= radius_m:
                want.add((lo["event_id"], hi["event_id"]))
    return want


def test_radius_join_matches_bruteforce(spark):
    from extractors_metadata_spark.operators.radius_join import (
        radius_self_join,
    )

    rng = np.random.default_rng(11)
    n = 250
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "lat": 33.07 + rng.uniform(0, 3e-4, n),   # ~33 m box: dense
            "lon": -111.98 + rng.uniform(0, 4e-4, n),
        }
    )
    got_rows = radius_self_join(
        spark, spark.createDataFrame(pdf), radius_m=2.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    assert got == _brute(pdf, 2.5)
    # exactly-once: no duplicate pair rows survived the k-ring symmetry
    assert len(got_rows) == len(got)
    # ordering contract
    assert all(r["id_a"] < r["id_b"] for r in got_rows)


def test_pick_res_ring_is_sound_and_bounded():
    from extractors_metadata_spark.functions import hexgrid
    from extractors_metadata_spark.operators.radius_join import pick_res_ring

    for radius in (0.5, 2.5, 50.0, 5000.0):
        res, ring = pick_res_ring(radius)
        s = float(hexgrid.res_size_m(res))
        assert s >= 2.0 * radius  # cell at least twice the radius
        # the lattice soundness inequality: 1.5*ring*s - 2s >= r_projected
        cos_min = math.cos(math.radians(66.0))
        assert 1.5 * ring * s - 2.0 * s >= radius / cos_min - 1e-9
        # and the fan-out stays bounded
        assert 3 * ring * ring + 3 * ring + 1 <= 37

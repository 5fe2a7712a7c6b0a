"""DBSCAN (operators/radius_join.dbscan)."""

from __future__ import annotations

import pandas as pd

from extractors_metadata_spark.operators.radius_join import dbscan

# ~1.11e-5 deg of latitude ~ 1.23 m; points spaced ~0.55 m vertically
STEP = 5e-6


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "lat": [33.0 + r[1] * STEP for r in rows],
                "lon": [-111.0 + r[2] * STEP for r in rows],
            }
        )
    )


def test_core_border_noise_roles(spark):
    rows = [
        # dense blob: 0,1,2 mutually within ~1.1 m (all core at min_pts=3)
        (0, 0, 0), (1, 1, 0), (2, 0, 1),
        # border: within eps of core 0 only via one link + one more point
        (3, -1, -1),
        # far noise
        (9, 1000, 1000),
    ]
    out = {r.id: r for r in dbscan(spark, _pts(spark, rows), eps_m=1.0, min_pts=3).collect()}
    assert out[0].role == "core" and out[0].cluster_id == 0
    assert out[1].role == "core" and out[1].cluster_id == 0
    assert out[2].role == "core" and out[2].cluster_id == 0
    # 3 neighbors: it touches 0 (and possibly 1/2) -> degree >= 2+1 = core
    # OR border; either way it must be in cluster 0 and not noise
    assert out[3].cluster_id == 0 and out[3].role in ("core", "border")
    assert out[9].role == "noise" and out[9].cluster_id == -1


def test_two_separate_clusters_and_min_ids(spark):
    rows = [
        (10, 0, 0), (11, 1, 0), (12, 0, 1),
        (20, 500, 500), (21, 501, 500), (22, 500, 501),
    ]
    out = {r.id: r for r in dbscan(spark, _pts(spark, rows), eps_m=1.0, min_pts=3).collect()}
    assert {out[i].cluster_id for i in (10, 11, 12)} == {10}
    assert {out[i].cluster_id for i in (20, 21, 22)} == {20}


def test_min_pts_gate(spark):
    rows = [(0, 0, 0), (1, 1, 0)]  # pair within eps, but min_pts=3
    out = {r.id: r for r in dbscan(spark, _pts(spark, rows), eps_m=1.0, min_pts=3).collect()}
    assert all(r.role == "noise" and r.cluster_id == -1 for r in out.values())
    out2 = {r.id: r for r in dbscan(spark, _pts(spark, rows), eps_m=1.0, min_pts=2).collect()}
    assert all(r.role == "core" and r.cluster_id == 0 for r in out2.values())

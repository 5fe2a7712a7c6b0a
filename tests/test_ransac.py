"""Deterministic RANSAC (operators/ransac.py): consensus recovery of a
dominant line, the degenerate-anchor rule, and candidate determinism."""

from __future__ import annotations


def _run(spark, pts, k=16, tol=5):
    from extractors_metadata_spark.operators.ransac import ransac_lines

    df = spark.createDataFrame(pts, "id long, x long, y long")
    return ransac_lines(df, k=k, tol=tol).collect()


def test_ransac_recovers_dominant_line(spark):
    """10 points on y = x plus 3 extreme scattered outliers: the best
    candidate scores exactly the 10 collinear points and its anchors
    lie on the line; any candidate with both anchors on the line ties
    at 10."""
    pts = [(i, 10 * i, 10 * i) for i in range(10)] + [
        (100, 5000, -7000), (101, -3000, 9000), (102, 8000, 2000),
    ]
    rows = _run(spark, pts)
    assert len(rows) == 16
    best = max(rows, key=lambda r: (r["n_inliers"], -r["cand_id"]))
    assert best["n_inliers"] == 10
    assert best["x1"] == best["y1"] and best["x2"] == best["y2"]
    for r in rows:
        if (
            r["x1"] == r["y1"]
            and r["x2"] == r["y2"]
            and (r["x1"], r["y1"]) != (r["x2"], r["y2"])
        ):
            assert r["n_inliers"] == 10


def test_ransac_degenerate_anchor_scores_zero(spark):
    """A single point: both salts must pick it -> every candidate is
    degenerate and scores 0 by the frozen rule."""
    rows = _run(spark, [(0, 5, 5)], k=8)
    assert len(rows) == 8
    assert all(r["n_inliers"] == 0 for r in rows)


def test_ransac_deterministic(spark):
    pts = [(i, 7 * i, 3 * i + (i % 3)) for i in range(20)]
    a = {r["cand_id"]: r for r in _run(spark, pts)}
    b = {r["cand_id"]: r for r in _run(spark, pts)}
    assert a.keys() == b.keys()
    for cid in a:
        assert a[cid] == b[cid]

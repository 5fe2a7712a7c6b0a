"""Exact-integer distributed k-means (operators/kmeans.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.functions.vhash import P31
from extractors_metadata_spark.operators.kmeans import (
    OFFSET,
    SCALE,
    _half_even_div,
    kmeans_assign,
    quantize,
)


def _vecs(n=120, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    # three separated blobs in [-0.9, 0.9]
    centers = rng.uniform(-0.6, 0.6, size=(3, dim))
    pts = centers[np.arange(n) % 3] + rng.normal(0, 0.05, size=(n, dim))
    return np.clip(pts, -0.99, 0.99).astype(np.float32)


def _df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(pts)), "embedding": [list(map(float, p)) for p in pts]}
        )
    )


def _py_kmeans(pts, k, iters):
    """Independent NumPy replay of the integer algorithm."""

    def poly(s):
        h = 0
        for ch in s:
            h = (h * 131 + ord(ch)) % P31
        return h

    def mix31(z):
        z ^= z >> 16
        z = (z * 0x85EBCA6B) % (1 << 31)
        z ^= z >> 13
        z = (z * 0xC2B2AE35) % (1 << 31)
        return z ^ (z >> 16)

    q = np.rint(pts.astype(np.float64) * SCALE).astype(np.int64) + OFFSET
    ids = np.arange(len(pts))
    hs = np.array([mix31(poly(f"km:{i}")) for i in ids])
    order = np.lexsort((ids, hs))
    cents = q[order[:k]].copy()
    for _ in range(iters):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                s = q[m].sum(axis=0)
                n = int(m.sum())
                cents[c] = [_half_even_div(int(x), n) for x in s]
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(pts)), a]


def test_matches_independent_numpy_replay(spark):
    pts = _vecs()
    got = {
        r.vec_id: (r.cluster, r.d2)
        for r in kmeans_assign(spark, _df(spark, pts), k=3, iters=2).collect()
    }
    a, d2 = _py_kmeans(pts, k=3, iters=2)
    for i in range(len(pts)):
        assert got[i] == (a[i], d2[i]), i


def test_partitioning_invariance(spark):
    pts = _vecs(n=90)
    base = _df(spark, pts)
    r1 = kmeans_assign(spark, base.repartition(13), k=3, iters=2).collect()
    r2 = kmeans_assign(spark, base.coalesce(1), k=3, iters=2).collect()
    assert sorted((r.vec_id, r.cluster, r.d2) for r in r1) == sorted(
        (r.vec_id, r.cluster, r.d2) for r in r2
    )


def test_blobs_recovered(spark):
    """3 well-separated blobs -> clusters align with blob identity."""
    pts = _vecs(n=150)
    rows = kmeans_assign(spark, _df(spark, pts), k=3, iters=3).collect()
    blob = {r.vec_id: r.vec_id % 3 for r in rows}
    # cluster -> majority blob must be a bijection and cover >= 95% of rows
    from collections import Counter

    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r.cluster, Counter())[blob[r.vec_id]] += 1
    majors = {c: cnt.most_common(1)[0] for c, cnt in per_cluster.items()}
    assert len({b for _, (b, _) in majors.items()}) == 3
    agree = sum(n for _, (_, n) in majors.items())
    assert agree >= 0.95 * len(rows)


def test_half_even_div():
    assert _half_even_div(7, 2) == 4  # 3.5 -> 4 (even)
    assert _half_even_div(5, 2) == 2  # 2.5 -> 2 (even)
    assert _half_even_div(9, 4) == 2  # 2.25 -> 2
    assert _half_even_div(11, 4) == 3  # 2.75 -> 3
    assert _half_even_div(10, 5) == 2


def test_quantize_is_half_even_fixed_point(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[0.00005, -0.00005, 0.25]]})
    )
    v = quantize(df).collect()[0].v
    want = [int(x) + OFFSET for x in np.rint(np.array([0.00005, -0.00005, 0.25], dtype=np.float32).astype(np.float64) * SCALE)]
    assert list(v) == want

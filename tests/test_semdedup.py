"""SemDeDup — embedding-cluster-then-dedup (operators/semdedup.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from extractors_metadata_spark.operators.semdedup import SD_SCALE, semdedup


def _df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(len(pts)),
                "embedding": [list(map(float, p)) for p in pts],
            }
        )
    )


def _blobs_with_dups(n=90, dim=8, seed=11):
    """Three separated blobs; every 5th vector gets a scaled near-copy
    appended (cosine exactly 1 pre-quantization)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.55, 0.55, size=(3, dim))
    pts = centers[np.arange(n) % 3] + rng.normal(0, 0.04, size=(n, dim))
    pts = np.clip(pts, -0.9, 0.9)
    dups = pts[::5] * 1.02
    return np.vstack([pts, dups]).astype(np.float64), n


def _py_greedy_flags(pts, tau_pct=99):
    """Independent integer replay of the single-cluster greedy rule."""
    u = np.rint(pts * SD_SCALE).astype(object)  # Python ints — no overflow
    n2 = [sum(int(x) * int(x) for x in row) for row in u]
    flags = []
    for b in range(len(pts)):
        dup = 0
        for a in range(b):
            dot = sum(int(x) * int(y) for x, y in zip(u[a], u[b]))
            if dot > 0 and 10_000 * dot * dot >= tau_pct**2 * n2[a] * n2[b]:
                dup = 1
                break
        flags.append(dup)
    return flags


def test_matches_independent_integer_replay(spark):
    """k=1 (single cluster) -> the dup flag must equal the exact NumPy/
    Python-int greedy replay, including natural blob-mate near-dups."""
    pts, _ = _blobs_with_dups()
    out = {
        r.vec_id: r.is_dup
        for r in semdedup(spark, _df(spark, pts), k=1, iters=1, tau_pct=99).collect()
    }
    want = _py_greedy_flags(pts)
    assert [out[i] for i in range(len(pts))] == want
    assert sum(want) >= len(range(0, 90, 5))  # the planted copies all flag


def test_scaled_copies_flagged_and_co_clustered(spark):
    pts, n = _blobs_with_dups()
    out = {
        r.vec_id: (r.cluster, r.is_dup)
        for r in semdedup(spark, _df(spark, pts), k=3, iters=3, tau_pct=99).collect()
    }
    assert len(out) == len(pts)
    # every scaled copy co-clusters with its original (cos = 1, tiny
    # Euclidean offset) and is flagged as the higher id of the pair
    for j, orig in enumerate(range(0, n, 5)):
        copy_id = n + j
        assert out[copy_id][0] == out[orig][0]
        assert out[copy_id][1] == 1, copy_id
    # id 0 has no lower id anywhere: never a dup
    assert out[0][1] == 0


def test_greedy_by_id_keeps_lowest_of_a_chain(spark):
    """Three mutually-similar vectors (scalar multiples): only the lowest
    id survives; both higher ids are dups — greedy-by-id, not pair-count."""
    base = np.array([0.3, -0.2, 0.5, 0.1], dtype=np.float64)
    pts = np.vstack([base, base * 1.01, base * 0.99, -base])
    out = {
        r.vec_id: r.is_dup
        for r in semdedup(spark, _df(spark, pts), k=1, iters=1, tau_pct=99).collect()
    }
    assert out[0] == 0
    assert out[1] == 1 and out[2] == 1
    # the antipode has cosine -1: dot <= 0 must never flag
    assert out[3] == 0


def test_threshold_is_integer_exact(spark):
    """tau boundary decided on integers: quantized u=(500, 0) vs (499, a)
    pairs sit on either side of cos = 0.99 by construction."""
    # cos(u, w) with u=(1, 0)*1.0 -> (500, 0); w = (x, y)
    # pick w1 nearly parallel (cos > 0.99), w2 at cos < 0.99
    pts = np.array(
        [[1.0, 0.0], [0.998, 0.06], [0.9, 0.42]], dtype=np.float64
    ) * 0.9  # keep |x| <= 1 margin
    out = {
        r.vec_id: r.is_dup
        for r in semdedup(spark, _df(spark, pts), k=1, iters=1, tau_pct=99).collect()
    }
    assert out[0] == 0  # lowest id always kept
    assert out[1] == 1  # cos ~ 0.9982 >= 0.99
    assert out[2] == 0  # cos ~ 0.906 < 0.99


def test_tau_pct_validated(spark):
    with pytest.raises(ValueError):
        semdedup(spark, _df(spark, np.zeros((2, 2))), tau_pct=100)

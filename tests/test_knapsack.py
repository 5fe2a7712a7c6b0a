"""knapsack_select: independent brute-force subset enumeration check
(the second-derivation-path rule)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from extractors_metadata_spark.operators.knapsack import knapsack_select


def _brute(items, cap):
    """(best value, min weight achieving it) by full enumeration."""
    best_v, best_w = 0, 0
    n = len(items)
    for r in range(1, n + 1):
        for sub in combinations(items, r):
            w = sum(x[1] for x in sub)
            v = sum(x[0] for x in sub)
            if w <= cap and (v > best_v or (v == best_v and w < best_w)):
                best_v, best_w = v, w
    return best_v, best_w


@pytest.mark.parametrize("seed", [1, 9])
def test_matches_enumeration(spark, seed):
    rng = np.random.RandomState(seed)
    rows = []
    truth = {}
    for g in range(3):
        items = [
            (int(rng.randint(0, 20)), int(rng.randint(1, 12)))
            for _ in range(10)
        ]
        for i, (v, w) in enumerate(items):
            rows.append((f"g{g}", i, v, w))
        truth[f"g{g}"] = _brute(items, 24)
    df = spark.createDataFrame(
        rows, "source string, doc_id long, v long, w long"
    )
    out = knapsack_select(df, capacity=24, n_items=16).collect()
    assert len(out) == 3
    for r in out:
        bv, bw = truth[r["source"]]
        assert r["best_v"] == bv, r
        # c_min is the min capacity achieving best_v == min weight of an
        # optimal subset
        assert r["c_min"] == bw, r

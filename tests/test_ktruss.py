"""k-truss pins: the K5-plus-appendage golden (support >= 2 keeps exactly
the clique) and the multi-round cascade (support decays as neighbors
peel)."""

from __future__ import annotations

from itertools import combinations


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_ktruss_keeps_clique_drops_appendages(spark):
    """K5 edges all have support 3; a pendant triangle sharing vertex 0
    and a dangling edge have support <= 1 and peel in round one -> the
    4-truss is exactly K5's 10 edges."""
    from extractors_metadata_spark.operators.linkgraph import k_truss

    k5 = list(combinations(range(5), 2))
    extra = [(5, 6), (0, 5), (0, 6), (6, 7)]
    out = {
        (r["a"], r["b"])
        for r in k_truss(_edges(spark, k5 + extra), k=4).collect()
    }
    assert out == set(k5)


def test_ktruss_cascade_to_empty(spark):
    """Two triangles sharing edge (1,2): that edge alone has support 2,
    but after round one strips its neighborhood it has support 0 — the
    4-truss is empty, and reaching it REQUIRES the second round."""
    from extractors_metadata_spark.operators.linkgraph import k_truss

    tri2 = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert k_truss(_edges(spark, tri2), k=4).count() == 0

"""1-WL refinement pins: symmetric-node color equality on a path, the
star center/leaf split, and the FAMOUS limitation — two triangles vs a
6-cycle are 1-WL-indistinguishable (every node keeps the same color
forever), which is exactly what makes WL the GNN expressiveness
benchmark."""

from __future__ import annotations


def _wl(spark, pairs, rounds=3):
    from extractors_metadata_spark.operators.linkgraph import wl_refine

    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return {r["node"]: r["wl_color"] for r in wl_refine(e, rounds).collect()}


def test_wl_path_symmetry_and_star_split(spark):
    # P4: ends {0,3} symmetric, middles {1,2} symmetric, ends != middles
    c = _wl(spark, [(0, 1), (1, 2), (2, 3)])
    assert c[0] == c[3] and c[1] == c[2] and c[0] != c[1]
    # star: center distinguishable from every leaf; leaves identical
    s = _wl(spark, [(0, 1), (0, 2), (0, 3)])
    assert s[1] == s[2] == s[3] != s[0]


def test_wl_cannot_separate_triangles_from_hexagon(spark):
    """Every node of 2xC3 and C6 is degree-2 with degree-2 neighbors:
    1-WL assigns ALL of them one color at every round — the canonical
    counterexample that bounds WL (and message-passing) expressiveness."""
    tri2 = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    hexa = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (10, 15)]
    c = _wl(spark, tri2 + hexa)
    assert len(set(c.values())) == 1 and len(c) == 12

"""Synchronous label propagation (operators/linkgraph.label_propagation):
hand-traced two-triangle-plus-bridge graph; the driver oracle (label_prop)
covers scale + the unrolled replay."""

from __future__ import annotations


def test_two_triangles_bridge(spark):
    from extractors_metadata_spark.operators.linkgraph import label_propagation

    # triangles {0,1,2} and {3,4,5}, bridge 2-3 (hand-traced 4 rounds)
    rows = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}


def test_isolated_pair_and_tiebreak(spark):
    from extractors_metadata_spark.operators.linkgraph import label_propagation

    # a single edge: both nodes adopt the other's label each round; after
    # an even number of rounds labels return home (synchronous flip)
    edges = spark.createDataFrame([(7, 9)], "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()}
    assert out == {7: 7, 9: 9}
    out1 = {r["node"]: r["label"] for r in label_propagation(edges, rounds=3).collect()}
    assert out1 == {7: 9, 9: 7}

"""Exact-integer HITS hubs/authorities (operators/linkgraph.hits)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.linkgraph import HITS_TARGET_BITS, hits


def _frames(spark, edge_list, n):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.range(n).select(F.col("id").alias("node"))
    return edges, nodes


def _py_hits(edge_list, n, rounds=4):
    """Independent Python-int replay of the integer algorithm."""
    start = 1 << (HITS_TARGET_BITS - 1)
    h = [start] * n

    def shift(v):
        m = max(v)
        sh = max(m.bit_length() - HITS_TARGET_BITS, 0)
        return [x >> sh for x in v]

    for _ in range(rounds):
        a = [0] * n
        for s, d in edge_list:
            a[d] += h[s]
        a = shift(a)
        h = [0] * n
        for s, d in edge_list:
            h[s] += a[d]
        h = shift(h)
    return h, a


def test_matches_independent_integer_replay(spark):
    rng = np.random.default_rng(3)
    n = 40
    edge_list = sorted(
        {
            (int(s), int(d))
            for s, d in rng.integers(0, n, size=(150, 2))
            if s != d
        }
        | {(i, (i + 1) % n) for i in range(n)}  # ring: every node connected
    )
    edges, nodes = _frames(spark, edge_list, n)
    out = {r.node: (r.hub_fp, r.auth_fp) for r in hits(edges, nodes, rounds=4).collect()}
    h, a = _py_hits(edge_list, n, rounds=4)
    assert len(out) == n
    for i in range(n):
        assert out[i] == (h[i], a[i]), i


def test_star_graph_separates_hub_and_authority(spark):
    """Center -> 5 leaves, plus a return edge so scores never collapse:
    the center must dominate hubs, the leaves must dominate authorities."""
    edge_list = [(0, i) for i in range(1, 6)] + [(1, 0)]
    edges, nodes = _frames(spark, edge_list, 6)
    out = {r.node: (r.hub_fp, r.auth_fp) for r in hits(edges, nodes, rounds=4).collect()}
    assert out[0][0] > max(out[i][0] for i in range(1, 6))  # center is the hub
    assert min(out[i][1] for i in range(2, 6)) > out[0][1] or out[0][1] == 0


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(9)
    n = 30
    edge_list = sorted(
        {(int(s), int(d)) for s, d in rng.integers(0, n, size=(90, 2)) if s != d}
        | {(i, (i + 1) % n) for i in range(n)}
    )
    edges, nodes = _frames(spark, edge_list, n)
    r1 = hits(edges.repartition(7), nodes, rounds=3).collect()
    r2 = hits(edges.coalesce(1), nodes.coalesce(1), rounds=3).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_edgeless_graph_raises(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.range(3).select(F.col("id").alias("node"))
    with pytest.raises(ValueError):
        hits(edges, nodes, rounds=1)


def test_modularity_two_triangles_bridge(spark):
    """Two triangles joined by one bridge, perfect 2-community labels:
    m = 7, each community e_in = 3, deg_sum = 7 -> q_term = 4*7*3 - 49
    = 35 each; Q = 70/196 = 5/14 (the textbook value)."""
    from extractors_metadata_spark.operators.linkgraph import modularity_score

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)], "node long, label long"
    )
    out = {r["label"]: r for r in modularity_score(e, lab).collect()}
    assert out[0]["m"] == 7
    assert out[0]["e_in"] == 3 and out[3]["e_in"] == 3
    assert out[0]["deg_sum"] == 7 and out[3]["deg_sum"] == 7
    assert out[0]["q_term"] == 35 and out[3]["q_term"] == 35
    # Q = (35+35)/(4*49) = 5/14


def test_modularity_counts_duplicate_arcs_once(spark):
    from extractors_metadata_spark.operators.linkgraph import modularity_score

    e = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 0)], "src long, dst long"
    )
    lab = spark.createDataFrame([(0, 0), (1, 0)], "node long, label long")
    out = modularity_score(e, lab).collect()
    assert len(out) == 1 and out[0]["m"] == 1 and out[0]["e_in"] == 1


def test_rich_club_star_plus_core(spark):
    """A 3-clique of hubs, each hub also serving 3 leaves: hub deg = 5,
    leaf deg = 1. For k in 1..4: n_k = 3 hubs, e_k = 3 clique edges;
    k = 5: empty."""
    from extractors_metadata_spark.operators.linkgraph import rich_club

    edges = [(0, 1), (1, 2), (0, 2)]
    nid = 10
    for h in (0, 1, 2):
        for _ in range(3):
            edges.append((h, nid)); nid += 1
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: (r["n_k"], r["e_k"]) for r in rich_club(e, max_k=6).collect()}
    for k in (1, 2, 3, 4):
        assert out[k] == (3, 3)
    assert out[5] == (0, 0)

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

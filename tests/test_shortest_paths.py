"""Bounded weighted SSSP (operators/linkgraph.shortest_paths): closed-form
hand graph — delta relaxation == true distances at the round bound, the
round bound's <=r-edge semantics, early exit; the driver oracle
(shortest_paths) covers scale + the unrolled full-Bellman-Ford replay."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def graph(spark):
    # 0 -5-> 1, 0 -1-> 2, 2 -1-> 1, 1 -1-> 3, 3 -1-> 0 (a cycle back)
    rows = [(0, 1, 5), (0, 2, 1), (2, 1, 1), (1, 3, 1), (3, 0, 1)]
    return spark.createDataFrame(rows, "src long, dst long, w long")


@pytest.fixture(scope="module")
def seed(spark):
    return spark.range(1).selectExpr("id AS node")


def test_sssp_converged_distances(graph, seed):
    from extractors_metadata_spark.operators.linkgraph import shortest_paths

    d = {r["node"]: r["dist"] for r in shortest_paths(graph, seed, rounds=6).collect()}
    # shortest 0->1 goes through 2 (1+1=2), beating the direct 5
    assert d == {0: 0, 2: 1, 1: 2, 3: 3}


def test_sssp_round_bound_is_edge_count(graph, seed):
    from extractors_metadata_spark.operators.linkgraph import shortest_paths

    d = {r["node"]: r["dist"] for r in shortest_paths(graph, seed, rounds=1).collect()}
    # one relaxation round = paths of <= 1 edge: direct 0->1 weight 5 stands
    assert d == {0: 0, 1: 5, 2: 1}


def test_sssp_unreachable_absent(spark, seed):
    from extractors_metadata_spark.operators.linkgraph import shortest_paths

    g = spark.createDataFrame([(7, 8, 1)], "src long, dst long, w long")
    d = shortest_paths(g, seed, rounds=3).collect()
    assert {r["node"] for r in d} == {0}

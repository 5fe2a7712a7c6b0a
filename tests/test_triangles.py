"""Triangle listing under degree orientation (linkgraph.triangle_list)."""

from __future__ import annotations

import itertools

import pandas as pd

from extractors_metadata_spark.operators.linkgraph import triangle_list


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_known_graph(spark):
    # K4 on {0,1,2,3} (4 triangles) + pendant 4 + disconnected edge 5-6
    pairs = list(itertools.combinations(range(4), 2)) + [(3, 4), (5, 6)]
    out = {(r.x, r.y, r.z) for r in triangle_list(_edges(spark, pairs)).collect()}
    assert out == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}


def test_direction_multiplicity_selfloops_collapse(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    out = {(r.x, r.y, r.z) for r in triangle_list(_edges(spark, pairs)).collect()}
    assert out == {(0, 1, 2)}


def test_each_triangle_once_brute_force(spark):
    # pseudo-random graph; compare against brute-force enumeration
    pairs = [((i * 7) % 13, (i * 11 + 3) % 13) for i in range(40)]
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    brute = {
        (a, b, c)
        for a, b, c in itertools.combinations(range(13), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    }
    got = sorted(
        (r.x, r.y, r.z) for r in triangle_list(_edges(spark, pairs)).collect()
    )
    assert got == sorted(brute)  # exactly once each, no dedup needed


def test_k_core_peels_pendants_and_chains(spark):
    from extractors_metadata_spark.operators.linkgraph import k_core

    # K4 core {0,1,2,3} + a chain 3-4-5-6 hanging off it: the chain must
    # peel one link per round (depth 3) — exercises multi-round cascade
    pairs = list(itertools.combinations(range(4), 2)) + [(3, 4), (4, 5), (5, 6)]
    out = {(r.a, r.b) for r in k_core(_edges(spark, pairs), k=2).collect()}
    assert out == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_k_core_bounded_rounds_stop_early(spark):
    from extractors_metadata_spark.operators.linkgraph import k_core

    # chain of 5: 2-core is empty; rounds=1 keeps the middle (simultaneous
    # peel removes only current degree-1 ends per round)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    full = k_core(_edges(spark, pairs), k=2, rounds=8).count()
    one = {(r.a, r.b) for r in k_core(_edges(spark, pairs), k=2, rounds=1).collect()}
    assert full == 0
    assert one == {(1, 2), (2, 3)}


def test_k_core_collapses_direction_and_multiplicity(spark):
    from extractors_metadata_spark.operators.linkgraph import k_core

    # both directions + a self-loop collapse before peeling: triangle
    # survives k=2 exactly once per undirected edge
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 2)]
    out = {(r.a, r.b) for r in k_core(_edges(spark, pairs), k=2).collect()}
    assert out == {(0, 1), (0, 2), (1, 2)}

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

"""Deterministic random-walk corpus (operators/walks.random_walks)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _mix31(z):
    z ^= z >> 16
    z = (z * 0x85EBCA6B) % (1 << 31)
    z ^= z >> 13
    z = (z * 0xC2B2AE35) % (1 << 31)
    return z ^ (z >> 16)


def _py_walks(edge_list, n_nodes, length):
    """Independent Python replay of the hash-guided successor rule."""
    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
    rows = set()
    for start in range(n_nodes):
        cur = start
        rows.add((start, 0, start))
        for t in range(1, length + 1):
            cur = min(
                adj[cur],
                key=lambda d: (
                    _mix31((cur * 131 + t * 7 + d * 13) % (1 << 31)),
                    d,
                ),
            )
            rows.add((start, t, cur))
    return rows


def _run(spark, edge_list, n_nodes, length, parts=1):
    from extractors_metadata_spark.operators.walks import random_walks

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    if parts > 1:
        edges = edges.repartition(parts)
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    out = random_walks(edges, nodes, length=length)
    return {(r["walk_id"], r["step"], r["node"]) for r in out.collect()}


def test_matches_python_replay(spark):
    # ring + a few chords: every node has outdeg >= 1
    n = 12
    edge_list = [(v, (v + 1) % n) for v in range(n)]
    edge_list += [(v, (v * 5 + 3) % n) for v in range(n)]
    edge_list = sorted(set(edge_list))
    got = _run(spark, edge_list, n, length=4)
    assert got == _py_walks(edge_list, n, 4)
    # every walk has exactly length+1 positions
    assert len(got) >= n  # at least the starts
    per_walk = {}
    for w, s, _ in got:
        per_walk.setdefault(w, set()).add(s)
    assert all(steps == set(range(5)) for steps in per_walk.values())


def test_partitioning_invariance(spark):
    n = 10
    edge_list = sorted(
        {(v, (v + 1) % n) for v in range(n)}
        | {(v, (v * 7 + 1) % n) for v in range(n)}
    )
    a = _run(spark, edge_list, n, length=3, parts=1)
    b = _run(spark, edge_list, n, length=3, parts=7)
    assert a == b


def test_single_out_edge_is_forced(spark):
    # pure ring: the only candidate must be taken regardless of hash
    n = 6
    edge_list = [(v, (v + 1) % n) for v in range(n)]
    got = _run(spark, edge_list, n, length=3)
    expect = {
        (w, t, (w + t) % n) for w in range(n) for t in range(4)
    }
    assert got == expect

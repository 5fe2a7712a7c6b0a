"""Unit tests for the round-4 third-session operators: k_hop BFS,
bounded-depth RDP, prefix-filter Jaccard join, MMR selection, and
snapshot diff — tiny hand-checkable inputs, exact expectations."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_k_hop_min_distance_and_bound(spark):
    from extractors_metadata_spark.operators.linkgraph import k_hop

    # path 0-1-2-3-4 plus shortcut 0-3: hop(3) must be 1, hop(4) = 2
    edges = _df(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)],
        "src long, dst long",
    )
    seeds = spark.range(1).select(F.col("id").alias("node"))
    out = {r.node: r.hop for r in k_hop(edges, seeds, hops=4).collect()}
    assert out == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}
    # bounded: hops=1 discovers only direct neighbors
    out1 = {r.node: r.hop for r in k_hop(edges, seeds, hops=1).collect()}
    assert out1 == {0: 0, 1: 1, 3: 1}


def test_rdp_keeps_spike_drops_collinear(spark):
    from extractors_metadata_spark.operators.trajectory import rdp_keep

    # one big spike at seq 3: ends + spike survive; after the split the
    # flat points sit ~98 units off the new chords, so eps=150 drops
    # them at level 2 while the 1000-unit spike clears level 1
    pts = _df(
        spark,
        [(1, 1, 0, 0), (1, 2, 100, 0), (1, 3, 200, 1000),
         (1, 4, 300, 0), (1, 5, 400, 0)],
        "user_id long, seq long, x long, y long",
    )
    kept = {(r.seq) for r in rdp_keep(pts, eps=150).collect()}
    assert kept == {1, 3, 5}


def test_rdp_straight_line_keeps_only_ends(spark):
    from extractors_metadata_spark.operators.trajectory import rdp_keep

    pts = _df(
        spark,
        [(7, i, i * 10, i * 10) for i in range(1, 6)],
        "user_id long, seq long, x long, y long",
    )
    kept = sorted(r.seq for r in rdp_keep(pts, eps=1).collect())
    assert kept == [1, 5]


def test_prefix_jaccard_exact_vs_bruteforce(spark):
    from extractors_metadata_spark.operators.dedup import (
        prefix_jaccard_join,
        word_shingles,
    )

    docs = _df(
        spark,
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u"),
         (4, "a b c q r s")],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.uni)
        for r in prefix_jaccard_join(docs, threshold_pct=50).collect()
    }
    # brute force on shingle sets
    sh = word_shingles(docs, "text", "doc_id", w=3).collect()
    sets: dict[int, set] = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    expect = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sets[i] & sets[j])
                uni = len(sets[i] | sets[j])
                if 100 * inter >= 50 * uni:
                    expect[(i, j)] = (inter, uni)
    assert got == expect and len(expect) >= 1


def test_mmr_first_pick_is_argmax_and_diversity_beats_greedy(spark):
    from extractors_metadata_spark.operators.similarity import mmr_select

    # q=0; all three docs tie on quantized relevance (127 * dq[0] =
    # 16129 each — int8 dots are direction-only), but 1 and 2 are
    # near-duplicates while 3 is half-orthogonal: MMR must pick 1
    # (tie -> min id), then 3 (lower redundancy vs 1: 16129 < 16311),
    # then 2 — pure relevance would have ranked (1, 2, 3).
    rows = [
        (0, [10.0, 0.0, 0.0]),
        (1, [9.0, 1.0, 0.0]),
        (2, [9.0, 0.9, 0.0]),
        (3, [5.0, 0.0, 5.0]),
    ]
    emb = _df(spark, rows, "vec_id long, embedding array<double>")
    out = {
        r.pick: r.doc_id
        for r in mmr_select(
            emb.filter(F.col("vec_id") == 0), emb, k_cand=3, k_sel=3
        ).collect()
    }
    assert out[1] == 1
    assert out[2] == 3
    assert out[3] == 2


def test_diff_snapshots_classifies_all_three(spark, tmp_path):
    from extractors_metadata_spark.sources.snapshot import (
        diff_snapshots,
        write_snapshot,
    )

    base = str(tmp_path / "t")
    v1 = write_snapshot(
        _df(spark, [(1, 10), (2, 20), (3, 30)], "k long, v long"),
        base, "append",
    )["snapshot_id"]
    v2 = write_snapshot(
        _df(spark, [(1, 10), (2, 99), (4, 40)], "k long, v long"),
        base, "replace",
    )["snapshot_id"]
    out = {r.k: r.change for r in
           diff_snapshots(spark, base, v1, v2, ("k",)).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}

from __future__ import annotations

import pytest

from extractors_metadata_spark.operators.textrank import textrank_chunks


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, chunk_idx int, chunk_text string")


def test_central_chunk_wins(spark):
    # chunk 0 shares >= 2 tokens with every other chunk (the hub); the
    # others only connect through it -> chunk 0 must rank first
    rows = [
        (1, 0, "alpha beta gamma delta"),
        (1, 1, "alpha beta zz1 zz2"),
        (1, 2, "gamma delta zz3 zz4"),
        (1, 3, "alpha delta zz5 zz6"),
    ]
    got = sorted(
        (r["pos"], r["chunk_idx"]) for r in textrank_chunks(_chunks(spark, rows)).collect()
    )
    assert got[0] == (1, 0)
    assert len(got) == 2


def test_docs_are_independent_components(spark):
    # identical structure in two docs -> identical per-doc ranking
    rows = []
    for d in (7, 8):
        rows += [
            (d, 0, "a b c d"),
            (d, 1, "a b x1 x2"),
            (d, 2, "c d y1 y2"),
        ]
    out = {}
    for r in textrank_chunks(_chunks(spark, rows)).collect():
        out.setdefault(r["doc_id"], []).append((r["pos"], r["chunk_idx"], r["rank"]))
    assert sorted(out[7]) == sorted(out[8])


def test_min_shared_threshold(spark):
    # only ONE shared token -> no edge -> all chunks isolated, equal rank,
    # tie-break by chunk_idx
    rows = [(1, 0, "common u1 u2"), (1, 1, "common v1 v2"), (1, 2, "w1 w2 w3")]
    got = sorted(
        (r["pos"], r["chunk_idx"]) for r in textrank_chunks(_chunks(spark, rows)).collect()
    )
    assert got == [(1, 0), (2, 1)]


def test_overflow_chunk_idx_raises(spark):
    rows = [(1, 64, "a b")]
    with pytest.raises(ValueError, match="node packing"):
        textrank_chunks(_chunks(spark, rows)).collect()

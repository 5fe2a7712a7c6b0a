"""Sliding-window document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest


def _run(spark, text, chunk_tokens, overlap):
    from extractors_metadata_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).orderBy("chunk_idx").collect()
    return [(r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in rows]


def test_chunking_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _run(spark, text, chunk_tokens=4, overlap=2)
    # stride 2: windows start at 0,2,4,6 — ceil((10-2)/2)=4 chunks
    assert got == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w2 w3 w4 w5"),
        (2, 4, "w4 w5 w6 w7"),
        (3, 4, "w6 w7 w8 w9"),
    ]
    # every consecutive pair shares exactly `overlap` tokens; full coverage
    covered = set()
    for _, _, t in got:
        covered.update(t.split(" "))
    assert covered == set(text.split(" "))


def test_chunking_short_doc_single_whole_chunk(spark):
    assert _run(spark, "a b c", chunk_tokens=8, overlap=2) == [(0, 3, "a b c")]
    assert _run(spark, "a", chunk_tokens=8, overlap=2) == [(0, 1, "a")]


def test_chunking_short_tail_window(spark):
    got = _run(spark, " ".join("abcdefghi"), chunk_tokens=4, overlap=1)
    # stride 3, 9 tokens: ceil((9-1)/3)=3 windows, last is short (3 tokens)
    assert [g[:2] for g in got] == [(0, 4), (1, 4), (2, 3)]
    assert got[-1][2] == "g h i"


def test_chunking_rejects_bad_overlap(spark):
    from extractors_metadata_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)

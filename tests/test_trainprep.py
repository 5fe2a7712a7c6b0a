"""Composed training-corpus prep (operators/trainprep.py)."""

from __future__ import annotations


def test_prep_training_corpus_composes_gates_and_chunks(spark):
    from extractors_metadata_spark.operators.trainprep import (
        prep_training_corpus,
    )

    docs = spark.createDataFrame(
        [
            # 12 unique words -> survives, chunks into 2 windows (8/2 stride 6)
            (1, "a b c d e f g h i j k l"),
            # pure repeat of doc 1's first line-chunks? no — exact copy:
            # every 4-word line already seen -> n_kept 0 -> dropped at gate
            (2, "a b c d e f g h i j k l"),
            # first line "a b c d" dups doc 1 -> cleaned to "m n o p",
            # 4 words < min_tokens 6 -> dropped at the size gate
            (3, "a b c d m n o p"),
        ],
        "doc_id long, text string",
    )
    out = prep_training_corpus(
        docs, words_per_line=4, min_tokens=6, chunk_tokens=8, overlap=2
    )
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in out.collect())
    )
    # doc 1: 12 words, stride 6 -> ceil((12-2)/6)=2 chunks
    assert [r[0] for r in rows] == [1, 1]
    assert rows[0][2] == "a b c d e f g h"
    assert rows[1][2] == "g h i j k l"

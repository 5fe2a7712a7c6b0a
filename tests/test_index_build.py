"""Positional inverted index (operators/index_build.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.index_build import inverted_index


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat sat on the mat",
                    "  The dog  and the cat ",
                    "mat mat mat",
                ],
            }
        )
    )


def test_postings_positions_and_df(spark):
    got = {
        (r.word, r.doc_id): (r.df_docs, list(r.positions), r.n_hits)
        for r in inverted_index(_docs(spark)).collect()
    }
    # 'the': doc1 positions 0 and 4; doc2 (casefolded, ragged spacing) 0 and 3
    assert got[("the", 1)] == (2, [0, 4], 2)
    assert got[("the", 2)] == (2, [0, 3], 2)
    assert got[("cat", 1)] == (2, [1], 1)
    assert got[("cat", 2)] == (2, [4], 1)
    assert got[("mat", 3)] == (2, [0, 1, 2], 3)
    assert got[("dog", 2)] == (1, [1], 1)
    # positional lookup: 'cat sat' phrase exists only in doc 1
    assert 2 in got[("sat", 1)][1][0:1] or got[("sat", 1)][1] == [2]


def test_max_df_prunes_stopwords_only(spark):
    got = inverted_index(_docs(spark), max_df=1).collect()
    words = {r.word for r in got}
    assert "the" not in words and "cat" not in words and "mat" not in words
    assert {"sat", "on", "dog", "and"} <= words
    assert all(r.df_docs <= 1 for r in got)


def test_empty_and_whitespace_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["", "   "]})
    )
    assert inverted_index(df).count() == 0


def test_posting_compress_hand_gaps(spark):
    """Term in docs {0, 1, 200}: gaps 1, 1, 199 -> varint bytes
    1 + 1 + 2 = 4 (199 has 8 bits -> 2 varint bytes); raw = 24."""
    from extractors_metadata_spark.operators.index_build import posting_compress

    rows = [(0, "x"), (1, "x"), (200, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = posting_compress(df).collect()[0]
    assert (r["word"], r["df_docs"]) == ("x", 3)
    assert r["bytes_varint"] == 4
    assert r["bytes_raw"] == 24


def test_posting_compress_large_gap_width(spark):
    """A gap needing the full 63-bit range: 2^62 has 63 bits -> 9
    varint bytes."""
    from extractors_metadata_spark.operators.index_build import posting_compress

    df = spark.createDataFrame(
        [(0, "y"), (1 << 62, "y")], "doc_id long, text string"
    )
    r = posting_compress(df).collect()[0]
    assert r["bytes_varint"] == 1 + 9


def test_code_size_compare_hand_gaps(spark):
    # docs 0,1,9 for word "w": gaps 1,1,8 -> blen 1,1,4
    # gamma: 1+1+7=9; delta: 1+1+(3+2*3-1... blen=4 -> 4-1+2*3-1=8) -> 10
    # rice(k=3): 4+4+(7//8+4=4)=12; varint: 8*3=24
    from extractors_metadata_spark.operators.index_build import code_size_compare

    df = spark.createDataFrame(
        [(0, "w"), (1, "w"), (9, "w")], "doc_id long, text string"
    )
    r = code_size_compare(df).collect()[0]
    assert (r["df_docs"], r["bits_gamma"], r["bits_delta"],
            r["bits_rice"], r["bits_varint"]) == (3, 9, 10, 12, 24)
    # Elias-Fano: u = 10 (max id 9 + 1), n = 3 -> l = blen(10//3)-1 = 1,
    # bits = 3 * (1 + 2) = 9
    assert r["bits_ef"] == 9


def test_lcp_expr_hand_cases(spark):
    from extractors_metadata_spark.operators.index_build import lcp_expr

    from pyspark.sql import functions as F

    rows = [
        ("abc", "abd", 2),
        ("abc", "abc", 3),
        ("abc", "abcdef", 3),
        ("x", "y", 0),
        ("", "anything", 0),
        ("prefixprefixprefixprefixprefixprefixA",
         "prefixprefixprefixprefixprefixprefixB", 36),
    ]
    df = spark.createDataFrame(rows, "a string, b string, want int")
    got = df.select(
        "want", F.expr(lcp_expr("a", "b")).alias("got")
    ).collect()
    assert all(r["got"] == r["want"] for r in got), [
        (r["want"], r["got"]) for r in got
    ]


def test_front_coding_block_bytes(spark):
    from extractors_metadata_spark.operators.index_build import front_coding

    # one doc, vocab {apple, applet, apply, banana} -> blocks a, b
    df = spark.createDataFrame(
        [(1, "apple applet apply banana")], "doc_id long, text string"
    )
    out = {r["blk"]: r for r in front_coding(df).collect()}
    a = out["a"]
    # sorted: apple (5+2), applet (lcp 5 -> 1+2), apply (lcp 4 -> 1+2)
    assert (a["n_terms"], a["bytes_raw"], a["bytes_fc"]) == (3, 19, 13)
    b = out["b"]
    assert (b["n_terms"], b["bytes_raw"], b["bytes_fc"]) == (1, 7, 8)

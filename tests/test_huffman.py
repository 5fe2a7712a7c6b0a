"""Optimal prefix-code cost (operators/huffman.py).

Pins the CLRS textbook construction, the degenerate conventions, and the
letter_weights codegen front end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.huffman import huffman_cost, letter_weights


def test_clrs_textbook_golden(spark):
    # CLRS fig 16.5 weights: f:5 e:9 c:12 b:13 d:16 a:45 -> optimal cost 224
    rows = [(0, 45), (1, 13), (2, 12), (3, 16), (4, 9), (5, 5)]
    df = spark.createDataFrame(
        [("k", s, w) for s, w in rows], "g string, sym long, w long"
    )
    r = huffman_cost(df, ["g"]).collect()[0]
    assert (r["n_syms"], r["total_w"], r["total_bits"]) == (6, 100, 224)


def test_degenerate_alphabets(spark):
    df = spark.createDataFrame(
        [("one", 0, 7), ("two", 0, 3), ("two", 1, 4), ("zero", 0, 0)],
        "g string, sym long, w long",
    )
    out = {r["g"]: r for r in huffman_cost(df, ["g"]).collect()}
    assert (out["one"]["n_syms"], out["one"]["total_bits"]) == (1, 0)
    # two symbols: one bit each -> cost = w1 + w2
    assert (out["two"]["n_syms"], out["two"]["total_bits"]) == (2, 7)
    # zero-weight symbols are dropped entirely -> no live symbols, no row
    assert "zero" not in out


def test_equal_weights_balanced_tree(spark):
    # 4 equal weights w=1 -> balanced depth-2 tree -> cost 8
    df = spark.createDataFrame(
        [("k", s, 1) for s in range(4)], "g string, sym long, w long"
    )
    assert huffman_cost(df, ["g"]).collect()[0]["total_bits"] == 8


def test_letter_weights_counts(spark):
    df = spark.createDataFrame(
        [("x", "Abba c!"), ("x", "zz")], "g string, text string"
    )
    w = {
        r["sym"]: r["w"]
        for r in letter_weights(df, ["g"], "text").filter(F.col("w") > 0).collect()
    }
    assert w == {0: 2, 1: 2, 2: 1, 25: 2}  # a=2 b=2 c=1 z=2


def test_shannon_sandwich_huffman_vs_entropy(spark):
    """Cross-operator invariant at sf0.001: for every language,
    H <= huffman_avg_bits <= H + 1 (the textbook source-coding
    sandwich) on the identical letter weights."""
    import math

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    hc = {
        r["lang"]: r
        for r in entry.queries()["huffman_cost"](spark, sf).collect()
    }
    eb = {
        r["lang"]: r
        for r in entry.queries()["entropy_bound"](spark, sf).collect()
    }
    assert set(hc) == set(eb)
    for lang in hc:
        total = hc[lang]["total_w"]
        avg_bits = hc[lang]["total_bits"] / total
        h_bits = eb[lang]["h_num"] / (total * 1e9 * math.log(2))
        assert h_bits - 1e-6 <= avg_bits <= h_bits + 1 + 1e-6, (
            lang, h_bits, avg_bits,
        )

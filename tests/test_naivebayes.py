"""Multinomial Naive Bayes language classifier (operators/naivebayes.py)."""

from __future__ import annotations

import math

import numpy as np

from extractors_metadata_spark.operators.naivebayes import naive_bayes_langid

# even ids train, odd ids score
ROWS = [
    (0, "aa", "the cat sat on the mat"),
    (2, "aa", "the dog ate the bone"),
    (4, "aa", "a cat and a dog"),
    (6, "bb", "le chat dort sur le tapis"),
    (8, "bb", "le chien mange le os"),
    (1, "aa", "the cat and the dog"),
    (3, "bb", "le chat et le chien"),
    (5, "aa", "the mat"),
    (7, "bb", "le tapis"),
]


def _py_nb(rows):
    """Independent fixed-point replay."""
    train = [(l, t.split()) for i, l, t in rows if i % 2 == 0]
    test = [(i, l, t.split()) for i, l, t in rows if i % 2 == 1]
    langs = sorted({l for l, _ in train})
    cwc = {}
    tc = {l: 0 for l in langs}
    vocab = set()
    for l, ws in train:
        for w in ws:
            cwc[(l, w)] = cwc.get((l, w), 0) + 1
            tc[l] += 1
            vocab.add(w)
    v = len(vocab)
    nc = {l: sum(1 for tl, _ in train if tl == l) for l in langs}
    n = len(train)

    def fp(num, den):
        return int(np.rint(math.log(float(num) / float(den)) * 1e9))

    out = {}
    for i, true_l, ws in test:
        best = None
        for l in langs:
            s = fp(nc[l], n)
            for w in ws:
                s += fp(cwc.get((l, w), 0) + 1, tc[l] + v)
            key = (-s, l)
            if best is None or key < best[0]:
                best = (key, l, s)
        out[i] = (true_l, best[1], best[2], len(ws))
    return out


def test_matches_independent_replay_and_separates(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.true_lang, r.pred_lang, r.score_fp, r.n_tokens)
        for r in naive_bayes_langid(df).collect()
    }
    want = _py_nb(ROWS)
    assert got == want
    # the hand corpus is cleanly separable: every prediction correct
    for i, (true_l, pred_l, _, _) in got.items():
        assert pred_l == true_l, i


def test_zero_token_docs_excluded(spark):
    rows = ROWS + [(9, "aa", "   ")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ids = {r.doc_id for r in naive_bayes_langid(df).collect()}
    assert 9 not in ids
    assert ids == {1, 3, 5, 7}


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    r1 = sorted(map(tuple, naive_bayes_langid(df.repartition(7)).collect()))
    r2 = sorted(map(tuple, naive_bayes_langid(df.coalesce(1)).collect()))
    assert r1 == r2


def test_one_rule_perfect_split_and_ties(spark):
    """Lengths {1,2,3} are 'a' and {10,11} are 'b' -> the stump t=3
    separates perfectly (5 correct, 0 errors); with one 'b' moved to
    length 2 the best achievable is 4 correct and the SMALLEST optimal
    threshold wins."""
    from pyspark.sql import functions as F

    from extractors_metadata_spark.operators.naivebayes import (
        one_rule_stump,
    )

    rows = [
        (0, "x", "a"), (1, "xy", "a"), (2, "xyz", "a"),
        (3, "x" * 10, "b"), (4, "x" * 11, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = one_rule_stump(df, F.length("text")).collect()[0]
    assert (r["threshold"], r["left_label"], r["right_label"]) == (3, "a", "b")
    assert (r["n_correct"], r["n_errors"], r["n_total"]) == (5, 0, 5)

    rows2 = rows + [(5, "zz", "b")]
    df2 = spark.createDataFrame(
        rows2, "doc_id long, text string, lang string"
    )
    r2 = one_rule_stump(df2, F.length("text")).collect()[0]
    assert r2["n_errors"] == 1
    assert r2["threshold"] == 3

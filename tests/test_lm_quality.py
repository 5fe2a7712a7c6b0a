"""Bigram-LM perplexity scoring (operators/lm_quality.py): closed-form hand
corpus — exact counts, OOV accounting, per-term fixed-point log-probs; the
driver oracle (lm_quality) covers scale + cross-engine replay."""

from __future__ import annotations

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    # even ids = train split, odd ids = scored split
    rows = [
        (0, "a b a b"),          # train: bigrams ab, ba, ab
        (2, "a b c"),            # train: ab, bc
        (1, "a b x"),            # score: ab (seen), bx (oov w2)
        (3, "c a"),              # score: ca (unseen pair, seen context c)
        (5, "z"),                # score: no bigrams -> absent from output
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fp(num: int, den: int) -> int:
    return int(np.rint(math.log(num / den) * 1e9))


def test_lm_score_closed_form(docs):
    from extractors_metadata_spark.operators.lm_quality import ngram_lm_score

    out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    # train counts: c(a,b)=3, c(b,a)=1, c(b,c)=1; contexts: c(a)=3, c(b)=2;
    # vocab = {a, b, c} -> V=3
    assert set(out) == {1, 3}
    r1 = out[1]
    assert (r1["n_bigrams"], r1["oov_bigrams"]) == (2, 1)
    assert r1["logprob_fp"] == _fp(3 + 1, 3 + 3) + _fp(0 + 1, 2 + 3)
    r3 = out[3]
    # c unseen as context: p = (0+1)/(0+3)
    assert (r3["n_bigrams"], r3["oov_bigrams"]) == (1, 1)
    assert r3["logprob_fp"] == _fp(1, 3)


def test_lm_score_train_docs_never_scored(docs):
    from extractors_metadata_spark.operators.lm_quality import ngram_lm_score

    ids = [r["doc_id"] for r in ngram_lm_score(docs).collect()]
    assert all(i % 2 == 1 for i in ids)


def test_kneser_ney_hand_counts(spark):
    """Hand corpus: the cat / the dog / the the the / ein hund ->
    c12 = {(the,cat):1,(cat,sat):1,(the,dog):1,(dog,sat):1,
    (the,the):2,(ein,hund):1}; continuation counts give (the,the)
    p = ((8-3)*6 + 3*3*1)/(4*4*6) = 39/96 and (the,cat) 15/96."""
    from extractors_metadata_spark.operators.lm_quality import (
        kneser_ney_counts,
    )

    rows = [
        (1, "the cat sat"),
        (2, "the dog sat"),
        (3, "the the the"),
        (4, "ein hund"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): r for r in kneser_ney_counts(df, k=10).collect()
    }
    assert len(out) == 6
    tt = out[("the", "the")]
    assert (tt["c"], tt["hist_count"], tt["follow_types"]) == (2, 4, 3)
    assert (tt["prec_types"], tt["bigram_types"]) == (1, 6)
    assert (tt["p_num"], tt["p_den"]) == (39, 96)
    tc = out[("the", "cat")]
    assert (tc["p_num"], tc["p_den"]) == (15, 96)
    cs = out[("cat", "sat")]
    assert (cs["p_num"], cs["p_den"]) == (12, 24)

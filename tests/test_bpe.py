"""BPE merge induction (operators/bpe.py): closed-form merge order on a hand
corpus, the greedy-overlap parity rule, and the reconstruction invariant;
the driver oracle (bpe_merges) covers scale + the unrolled SQL replay."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    # word freqs: low=3, lower=2, newest=1 (the Sennrich toy shape)
    rows = [
        (1, "low low lower"),
        (2, "low lower newest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_merge_order_closed_form(docs, spark):
    from extractors_metadata_spark.operators.bpe import bpe_merges

    rows = bpe_merges(docs, rounds=3).orderBy("round").collect()
    # pair counts round 1: (l,o)=5, (o,w)=5, (w,</w>)=3, (w,e)=2, (e,r)=2,
    # (r,</w>)=2, newest pairs=1 each -> tie (l,o) vs (o,w) breaks to (l,o)
    assert (rows[0]["left_sym"], rows[0]["right_sym"], rows[0]["pair_freq"]) == (
        "l", "o", 5,
    )
    # round 2: (lo,w)=5 wins
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_freq"]) == (
        "lo", "w", 5,
    )
    # round 3: (low,</w>)=3 wins
    assert (rows[2]["left_sym"], rows[2]["right_sym"], rows[2]["pair_freq"]) == (
        "low", "</w>", 3,
    )


def test_bpe_greedy_overlap_parity(spark):
    from extractors_metadata_spark.operators.bpe import (
        _initial_symbols,
        _merge_round,
    )

    words = spark.createDataFrame(
        [("aaaa", 1), ("aaa", 1), ("aba", 1)], "word string, tf long"
    )
    out = {
        r["word"]: r["syms"]
        for r in _merge_round(_initial_symbols(words), "a", "a").collect()
    }
    assert out["aaaa"] == ["aa", "aa", "</w>"]  # every other candidate
    assert out["aaa"] == ["aa", "a", "</w>"]    # greedy left-to-right
    assert out["aba"] == ["a", "b", "a", "</w>"]  # no candidates


def test_bpe_symbols_reconstruct_words(docs):
    from extractors_metadata_spark.operators.bpe import (
        _initial_symbols,
        _merge_round,
        bpe_merges,
    )
    from extractors_metadata_spark.operators.corpus import vocabulary

    merges = bpe_merges(docs, rounds=3).orderBy("round").collect()
    wsyms = _initial_symbols(vocabulary(docs).select("word", "tf"))
    for m in merges:
        wsyms = _merge_round(wsyms, m["left_sym"], m["right_sym"])
    for r in wsyms.collect():
        assert "".join(r["syms"]) == r["word"] + "</w>"


def test_bpe_encode_counts(docs, spark):
    from extractors_metadata_spark.operators.bpe import bpe_encode

    out = {r["doc_id"]: r for r in bpe_encode(docs, rounds=3).collect()}
    # after merges (l,o) (lo,w) (low,</w>): "low" -> 1 sym [low</w>],
    # "lower" -> 4 [low, e, r, </w>], "newest" -> 7 (6 chars + </w>, no
    # learned merge applies). doc 1 = "low low lower", doc 2 =
    # "low lower newest"
    assert (out[1]["ws_tokens"], out[1]["bpe_tokens"]) == (3, 1 + 1 + 4)
    assert (out[2]["ws_tokens"], out[2]["bpe_tokens"]) == (3, 1 + 4 + 7)


def test_bpe_exhausted_vocab_oracle_parity(docs, spark):
    """ADVICE r4: when the vocabulary runs out of pairs before ``rounds``,
    _learn early-exits keeping the last symbol frame; the unrolled oracle
    must NOT empty later stages (bst{r} joins via LEFT JOIN ON 1=1, so an
    empty best-pair frame yields identity rounds). Corpus of one 1-char
    word exhausts after a single merge; rounds=4 forces three exhausted
    oracle rounds."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from extractors_metadata_spark.operators.bpe import bpe_encode, bpe_merges

    tiny = spark.createDataFrame(
        [(1, "a a"), (2, "a")], "doc_id long, text string"
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [1, 2], "text": ["a a", "a"]}))

    merges = bpe_merges(tiny, rounds=4).toPandas()
    assert len(merges) == 1  # only (a, </w>) is learnable
    om = con.execute(entry._bpe_stages_sql(4)).df()
    assert len(om) == 1
    assert (om.iloc[0]["left_sym"], om.iloc[0]["right_sym"]) == ("a", "</w>")

    enc = bpe_encode(tiny, rounds=4).toPandas().sort_values("doc_id")
    oe = con.execute(entry._bpe_encode_sql(4)).df().sort_values("doc_id")
    assert len(oe) == 2, "oracle emptied on exhausted vocab"
    assert enc["ws_tokens"].tolist() == oe["ws_tokens"].tolist() == [2, 1]
    assert enc["bpe_tokens"].tolist() == oe["bpe_tokens"].tolist() == [2, 1]

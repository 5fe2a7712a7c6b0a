"""Winnowing fingerprints (operators/winnow.py): the SWA guarantee, the
per-doc dedup of identical documents, kernel<->oracle parity on a hand
corpus, and the pair join's df cap."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus():
    # doc 2 is doc 0 with a one-word local edit; doc 3 is byte-identical to
    # doc 0 (the per-doc-dedup regression case); doc 4 is unrelated.
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    return [
        (0, base),
        (1, "completely different text with no overlap whatsoever in any gram"),
        (2, base.replace("jumps", "leaps")),
        (3, base),
        (4, "short"),
    ]


def test_winnow_guarantee_and_identical_docs(spark, corpus):
    from extractors_metadata_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_pairs,
    )

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    fps = winnow_fingerprints(df).toPandas()
    by_doc = {d: set(map(tuple, g[["pos", "fp"]].to_numpy()))
              for d, g in fps.groupby("doc_id")}
    # identical docs select identical (pos, fp) sets — and BOTH appear
    assert by_doc[0] == by_doc[3] and len(by_doc[0]) > 0
    # the guarantee: docs 0 and 2 share long runs (>= k+w-1 = 10 chars), so
    # they must share fingerprint VALUES; doc 1 shares none with doc 0
    vals = lambda d: {fp for _, fp in by_doc.get(d, set())}
    assert len(vals(0) & vals(2)) >= 3
    assert not (vals(0) & vals(1))
    # doc 4 is shorter than k: no grams, no fingerprints
    assert 4 not in by_doc
    # density sanity: selections per window bound (<= one per window)
    n_grams = len(corpus[0][1]) - 7 + 1
    assert len(by_doc[0]) <= n_grams - 4 + 1

    pairs = winnow_pairs(df, min_shared=3, max_df=10).toPandas()
    got = {(a, b) for a, b in pairs[["doc_a", "doc_b"]].to_numpy()}
    assert (0, 3) in got and (0, 2) in got and (2, 3) in got
    assert not any(1 in p or 4 in p for p in got)


def test_winnow_oracle_parity_hand_corpus(spark, corpus):
    from extractors_metadata_spark.operators.winnow import winnow_fingerprints

    import oracles

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = (
        winnow_fingerprints(df)
        .toPandas()
        .sort_values(["doc_id", "pos", "fp"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [c[0] for c in corpus],
                      "text": [c[1] for c in corpus]}),
    )
    want = (
        con.execute(oracles._WINNOW_FPS_SQL)
        .df()
        .sort_values(["doc_id", "pos", "fp"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("doc_id", "pos", "fp"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist()


def test_winnow_df_cap_drops_boilerplate(spark):
    from extractors_metadata_spark.operators.winnow import winnow_pairs

    # 12 docs sharing ONLY one boilerplate sentence: every shared
    # fingerprint has df = 12 > max_df = 10, so no pairs survive
    rows = [(i, f"unique lead {i} " * 3 + "shared boilerplate sentence here")
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_pairs(df, min_shared=1, max_df=10).count() == 0

"""BM25 ranked retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "spark join spark window"),
    (1, "join window window filter table"),
    (2, "spark spark spark scan"),
    (3, "table filter scan merge merge"),
    (4, "window"),
]


def _py_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Independent reference: per-(term, doc) half-even 1e-9 fixed point,
    then int sums — the operator's exactness contract, recomputed from
    scratch with no shared code."""
    toks = {d: t.split() for d, t in docs}
    n = float(len(docs))
    dl = {d: float(len(ts)) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for w in set(ts):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, ts in toks.items():
        s = 0
        for w in query_terms:
            tf = float(ts.count(w))
            if tf == 0 or w not in df:
                continue
            dff = float(df[w])
            idf = math.log(1.0 + (((n - dff) + 0.5) / (dff + 0.5)))
            score = idf * ((tf * (k1 + 1.0)) / (tf + (k1 * ((1.0 - b) + (b * (dl[d] / avgdl))))))
            # mirror np.rint half-even
            v = score * 1e9
            fl = math.floor(v)
            fr = v - fl
            s += fl + 1 if fr > 0.5 or (fr == 0.5 and fl % 2 == 1) else fl
        if s:
            out[d] = s
    return out


def _run(spark, queries, k=10):
    docs = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    qdf = spark.createDataFrame(queries, "query_id string, word string")
    return bm25_topk(docs, qdf, k=k).collect()


def test_scores_match_independent_reference(spark):
    rows = _run(spark, [("qa", "spark"), ("qa", "window")])
    got = {r.doc_id: r.score_fp for r in rows}
    want = _py_bm25(DOCS, ["spark", "window"])
    assert got == want


def test_ranking_and_tiebreak_are_deterministic(spark):
    rows = _run(spark, [("qa", "merge")])
    # only doc 3 contains "merge"
    assert [(r.doc_id, r.rank) for r in rows] == [(3, 1)]
    rows = _run(spark, [("qb", "window")])
    ranked = sorted(rows, key=lambda r: r.rank)
    # rarer-in-doc ties broken by doc_id asc; ordering follows score desc
    scores = [r.score_fp for r in ranked]
    assert scores == sorted(scores, reverse=True)
    ids = [r.doc_id for r in ranked]
    assert len(set(ids)) == len(ids)


def test_k_cut_and_repeated_term_contract(spark):
    rows = _run(spark, [("qa", "spark"), ("qa", "spark")], k=1)
    # duplicate term rows collapse via distinct(): score == single-term score
    want = _py_bm25(DOCS, ["spark"])
    top = max(want.items(), key=lambda kv: (kv[1], -kv[0]))
    assert len(rows) == 1
    assert rows[0].doc_id == top[0] and rows[0].score_fp == top[1]


def test_broadcast_plan_shape(spark):
    docs = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    qdf = spark.createDataFrame([("qa", "spark")], "query_id string, word string")
    plan = (
        bm25_topk(docs, qdf)._jdf.queryExecution().executedPlan().toString()
    )
    # the query-term dim must broadcast into the postings scan
    assert "BroadcastHashJoin" in plan


def test_retrieval_eval_hand_case(spark):
    from extractors_metadata_spark.operators.retrieval import _NDCG_W, retrieval_eval

    ranked = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 20, 2), ("q1", 30, 3),
         ("q2", 40, 1), ("q2", 50, 2)],
        "query_id string, doc_id long, rank int",
    )
    labels = spark.createDataFrame(
        [("q1", 10, 0), ("q1", 20, 2), ("q1", 30, 1)],  # q2 unlabeled -> rel 0
        "query_id string, doc_id long, rel int",
    )
    got = {
        r["query_id"]: (r["dcg_fp"], r["idcg_fp"], r["first_rel"], r["n_rel"])
        for r in retrieval_eval(ranked, labels, k=3).collect()
    }
    w = _NDCG_W
    # q1 gains by rank: 0, 3, 1; ideal order: 3, 1, 0
    assert got["q1"] == (3 * w[1] + 1 * w[2], 3 * w[0] + 1 * w[1], 2, 2)
    # q2: nothing relevant -> zeros, first_rel 0
    assert got["q2"] == (0, 0, 0, 0)

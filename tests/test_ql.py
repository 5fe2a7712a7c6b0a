"""Pins for query-likelihood Dirichlet retrieval: the background prior
for zero-tf terms, ranking sanity, and partitioning invariance of the
fixed-point sum."""

from __future__ import annotations


def _run(spark, docs_rows, k=10):
    from extractors_metadata_spark.operators.retrieval import ql_dirichlet_topk

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [("q1", "apple"), ("q1", "banana")], "query_id string, word string"
    )
    return ql_dirichlet_topk(docs, q, k=k)


def test_ql_full_vocab_expansion_ranks_coverage_first(spark):
    """Both docs contain 'apple'; only d1 contains 'banana'. d2's banana
    term scores the background prior only, so d1 must outrank d2 — the
    behavior hit-only scoring (bm25-style candidates without expansion)
    cannot produce."""
    rows = [(1, "apple banana pear"), (2, "apple apple pear")]
    out = _run(spark, rows).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ranked] == [1, 2]
    # every candidate scores BOTH query terms: 2 terms x 2 docs summed
    # into 2 rows, scores strictly negative (log-probabilities)
    assert len(out) == 2 and all(r["score_fp"] < 0 for r in out)


def test_ql_partitioning_invariant(spark):
    rows = [(i, "apple banana word" + str(i % 7)) for i in range(40)]
    a = {
        (r["query_id"], r["doc_id"]): r["score_fp"]
        for r in _run(spark, rows).collect()
    }
    from extractors_metadata_spark.operators.retrieval import ql_dirichlet_topk

    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(16)
    q = spark.createDataFrame(
        [("q1", "apple"), ("q1", "banana")], "query_id string, word string"
    )
    b = {
        (r["query_id"], r["doc_id"]): r["score_fp"]
        for r in ql_dirichlet_topk(docs, q, k=10).collect()
    }
    assert a == b and len(a) == 10

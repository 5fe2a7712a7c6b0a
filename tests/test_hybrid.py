"""Pins for hybrid RRF fusion: fused value is the exact 1/(c+r) sum of
the lists a doc appears in, ranking follows fused desc with the doc-id
tie-break, and docs retrieved by neither ranker never appear."""

from __future__ import annotations


def test_hybrid_rrf_fusion_semantics(spark):
    from extractors_metadata_spark.operators.retrieval import hybrid_rrf

    rows = [
        (1, "alpha beta common words here"),
        (2, "alpha alpha alpha filler filler"),
        (3, "beta beta beta filler filler"),
        (4, "unrelated filler words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [("q1", "alpha"), ("q1", "beta")], "query_id string, word string"
    )
    out = sorted(
        (r.asDict() for r in hybrid_rrf(docs, q).collect()),
        key=lambda r: r["hybrid_rank"],
    )
    ids = {r["doc_id"] for r in out}
    assert 4 not in ids and ids == {1, 2, 3}
    for r in out:
        contributions = [
            1.0 / (60.0 + r["r_bm25"]) if r["r_bm25"] else 0.0,
            1.0 / (60.0 + r["r_ql"]) if r["r_ql"] else 0.0,
        ]
        assert r["fused"] == sum(contributions)
    # hybrid_rank is exactly the (fused desc, doc_id asc) order
    expect = sorted(out, key=lambda r: (-r["fused"], r["doc_id"]))
    assert [r["doc_id"] for r in expect] == [r["doc_id"] for r in out]
    assert [r["hybrid_rank"] for r in out] == [1, 2, 3]


def test_hybrid_outer_fusion_missing_list(spark):
    """With k_each=1 each ranker contributes ONE doc; if they disagree,
    each fused doc carries exactly one reciprocal term and a zero from
    the missing list."""
    from extractors_metadata_spark.operators.retrieval import hybrid_rrf

    rows = [
        (1, "alpha alpha alpha alpha"),
        (2, "beta beta beta beta beta beta beta beta beta filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [("q1", "alpha"), ("q1", "beta")], "query_id string, word string"
    )
    out = {r["doc_id"]: r.asDict() for r in hybrid_rrf(docs, q, k_each=1).collect()}
    for r in out.values():
        present = (1 if r["r_bm25"] else 0) + (1 if r["r_ql"] else 0)
        if present == 1:
            rank = r["r_bm25"] or r["r_ql"]
            assert r["fused"] == 1.0 / (60.0 + rank)

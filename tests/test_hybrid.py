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


def test_rbo_identical_and_disjoint(spark):
    from extractors_metadata_spark.operators.retrieval import rbo_overlap

    k = 10
    ident = [("q", d, r) for r, d in enumerate(range(100, 110), 1)]
    a = spark.createDataFrame(ident, "query_id string, doc_id long, rank int")
    out = rbo_overlap(a, a, k=k).collect()[0]
    # full agreement -> RBO = 1 - p^k exactly: num = lcm*(10^k - 9^k)
    assert out["den"] == 2520 * 10**10
    assert out["rbo_num"] == 2520 * (10**10 - 9**10)
    assert out["n_overlap"] == 10

    b = spark.createDataFrame(
        [("q", d, r) for r, d in enumerate(range(500, 510), 1)],
        "query_id string, doc_id long, rank int",
    )
    out2 = rbo_overlap(a, b, k=k).collect()[0]
    assert (out2["n_overlap"], out2["rbo_num"]) == (0, 0)


def test_rbo_matches_fraction_reference(spark):
    from fractions import Fraction

    from extractors_metadata_spark.operators.retrieval import rbo_overlap

    k = 10
    docs_a = [3, 1, 4, 1000, 5, 9, 2, 6, 8, 7]
    docs_b = [9, 3, 1, 5, 2000, 4, 7, 2, 3000, 6]
    a = spark.createDataFrame(
        [("q", d, r) for r, d in enumerate(docs_a, 1)],
        "query_id string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [("q", d, r) for r, d in enumerate(docs_b, 1)],
        "query_id string, doc_id long, rank int",
    )
    out = rbo_overlap(a, b, k=k).collect()[0]
    # independent reference: prefix-overlap definition with Fractions
    p = Fraction(9, 10)
    rbo = Fraction(0)
    for d in range(1, k + 1):
        x = len(set(docs_a[:d]) & set(docs_b[:d]))
        rbo += (1 - p) * p ** (d - 1) * Fraction(x, d)
    assert Fraction(out["rbo_num"], out["den"]) == rbo

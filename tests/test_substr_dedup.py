"""ExactSubstr coverage (operators/substr_dedup.py): closed-form duplicated
spans, island merging, zero rows; the driver oracle (exact_substr) covers
scale + replay."""

from __future__ import annotations

import pytest


def test_duplicated_span_coverage_closed_form(spark):
    from extractors_metadata_spark.operators.substr_dedup import (
        exact_substr_coverage,
    )

    # w=3 windows; "a b c d" appears in docs 1 and 2 -> windows "a b c" and
    # "b c d" duplicated in both; doc 3 is clean
    rows = [
        (1, "a b c d x y z"),
        (2, "q a b c d"),
        (3, "k l m n o"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substr_coverage(docs, window=3).collect()}
    # doc 1: dup windows at pos 0,1 -> one island, cov = 1 - 0 + 3 = 4 ("a b c d")
    assert (out[1]["n_tokens"], out[1]["dup_windows"], out[1]["dup_token_cov"]) == (7, 2, 4)
    # doc 2: dup windows at pos 1,2 -> cov 4
    assert (out[2]["n_tokens"], out[2]["dup_windows"], out[2]["dup_token_cov"]) == (5, 2, 4)
    assert (out[3]["dup_windows"], out[3]["dup_token_cov"]) == (0, 0)


def test_separate_islands_not_merged(spark):
    from extractors_metadata_spark.operators.substr_dedup import (
        exact_substr_coverage,
    )

    # the dup span "p q r" appears at both ends of doc 1, separated by a
    # long unique middle -> two islands of coverage 3 each
    rows = [
        (1, "p q r u1 u2 u3 u4 u5 u6 p q r"),
        (2, "p q r"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substr_coverage(docs, window=3).collect()}
    assert (out[1]["dup_windows"], out[1]["dup_token_cov"]) == (2, 6)


def test_self_repeat_counts(spark):
    from extractors_metadata_spark.operators.substr_dedup import (
        exact_substr_coverage,
    )

    # within-doc repetition alone makes a window duplicated
    docs = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    out = exact_substr_coverage(docs, window=4).collect()[0]
    # windows: "a b a b"(0), "b a b a"(1), "a b a b"(2) -> key "a b a b" dups
    assert (out["dup_windows"], out["dup_token_cov"]) == (2, 6)

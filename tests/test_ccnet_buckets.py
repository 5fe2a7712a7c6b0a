"""Pins for CCNet perplexity bucketing: tertile edge rule, bucket
monotonicity in the integer NLL key, and the head = most-predictable
ordering."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ccnet_tertile_rule_and_monotonicity(spark):
    from extractors_metadata_spark.operators.lm_quality import ccnet_buckets

    # even ids train the bigram LM on "a b" loops; odd ids are scored:
    # ids 1,3,5 repeat the trained pattern (low NLL), ids 7,9,11 are
    # unseen vocabulary (OOV, high NLL)
    rows = [(i, "a b a b a b a b", "en") for i in range(0, 12, 2)]
    rows += [(i, "a b a b a b a b", "en") for i in (1, 3, 5)]
    rows += [
        (7, "x y z w q r s t", "en"),
        (9, "m n o p u v k j", "en"),
        (11, "g h c d e f i l", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(df).collect()
    assert len(out) == 6
    by_bucket = {b: [] for b in ("head", "middle", "tail")}
    for r in out:
        by_bucket[r["bucket"]].append(r)
    # n=6 -> tertile rule gives exactly 2/2/2
    assert [len(by_bucket[b]) for b in ("head", "middle", "tail")] == [2, 2, 2]
    # the trained-pattern docs outrank the OOV docs: head is all-trained,
    # tail is all-OOV
    assert {r["doc_id"] for r in by_bucket["head"]} <= {1, 3, 5}
    assert {r["doc_id"] for r in by_bucket["tail"]} <= {7, 9, 11}
    # key monotonicity across buckets
    assert max(r["nll_milli"] for r in by_bucket["head"]) <= min(
        r["nll_milli"] for r in by_bucket["tail"]
    )

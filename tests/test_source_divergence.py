"""Per-source KL divergence (operators/corpus.source_divergence): closed-form
hand corpus; the driver oracle (source_divergence) covers scale + replay."""

from __future__ import annotations

import math

import numpy as np


def test_kl_closed_form(spark):
    from extractors_metadata_spark.operators.corpus import source_divergence

    rows = [
        (1, "a a b", "s1"),
        (2, "b b b", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_divergence(docs).collect()}
    # corpus: a=2, b=4, n=6; s1: a=2, b=1, n=3; s2: b=3, n=3
    def fp(csw, ns, cw, n):
        return int(np.rint((csw / ns) * math.log((csw * n) / (ns * cw)) * 1e12))

    assert (out["s1"]["n_words"], out["s1"]["n_tokens"]) == (2, 3)
    assert out["s1"]["kl_fp"] == fp(2, 3, 2, 6) + fp(1, 3, 4, 6)
    assert (out["s2"]["n_words"], out["s2"]["n_tokens"]) == (1, 3)
    assert out["s2"]["kl_fp"] == fp(3, 3, 4, 6)


def test_identical_source_has_zero_kl(spark):
    from extractors_metadata_spark.operators.corpus import source_divergence

    rows = [(1, "x y", "s1"), (2, "x y", "s2")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for r in source_divergence(docs).collect():
        assert r["kl_fp"] == 0

"""Deterministic sampling/splitting/packing (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(i % 7 + 1)), "en" if i % 3 else "de") for i in range(60)]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_hash_split_deterministic_and_weighted(docs):
    from extractors_metadata_spark.operators.sampling import hash_split

    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    assert a == b  # pure function of the key
    assert set(a.values()) <= {"train", "val", "test"}
    assert sum(1 for v in a.values() if v == "train") > sum(
        1 for v in a.values() if v == "test"
    )


def test_stratified_sample_membership_stable_under_append(spark, docs):
    from extractors_metadata_spark.operators.sampling import stratified_sample

    frac = {"en": 0.5, "de": 0.25}
    kept1 = {r["doc_id"] for r in stratified_sample(docs, "lang", frac, "doc_id").collect()}
    # appending new rows must not change membership of existing rows
    more = spark.createDataFrame([(100 + i, "x y", "en") for i in range(20)],
                                 "doc_id int, text string, lang string")
    kept2 = {r["doc_id"] for r in stratified_sample(docs.unionByName(more), "lang", frac, "doc_id").collect()}
    assert kept1 == {k for k in kept2 if k < 100}


def test_pack_sequences_bins_are_contiguous_and_bounded(docs):
    from extractors_metadata_spark.operators.sampling import pack_sequences

    out = pack_sequences(docs, budget=10, shard_col="lang", order_col="doc_id")
    rows = sorted(
        ((r["lang"], r["doc_id"], r["n_tokens"], r["cum_tokens"], r["bin_id"]) for r in out.collect())
    )
    by_shard: dict = {}
    for lang, did, n, cum, b in rows:
        by_shard.setdefault(lang, []).append((did, n, cum, b))
    for lang, seq in by_shard.items():
        seq.sort()
        run = 0
        for did, n, cum, b in seq:
            assert cum == run + n  # running sum replays exactly
            assert b == run // 10  # bin = tokens before this doc, quantized
            run = cum
        bins = [b for _, _, _, b in seq]
        assert bins == sorted(bins)  # contiguous, monotone bins


def test_exact_count_split_sizes_and_determinism(spark):
    import pandas as pd

    from extractors_metadata_spark.operators.sampling import exact_count_split

    # strata with awkward sizes: exact-count semantics must hold per stratum
    rows = [(i, "a") for i in range(40)] + [(100 + i, "b") for i in range(7)] \
        + [(200 + i, "c") for i in range(1)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    out = exact_count_split(df, "lang", "doc_id").collect()
    sizes = {}
    for r in out:
        sizes.setdefault(r.lang, {}).setdefault(r.split, 0)
        sizes[r.lang][r.split] += 1
    # 40 docs: floor(40*50/1000)=2 each for val/test, 36 train — EXACT
    assert sizes["a"] == {"train": 36, "val": 2, "test": 2}
    # 7 docs: floor(7*50/1000)=0 -> all train
    assert sizes["b"] == {"train": 7}
    assert sizes["c"] == {"train": 1}
    # deterministic under repartition
    again = {
        (r.doc_id, r.split)
        for r in exact_count_split(df.repartition(9), "lang", "doc_id").collect()
    }
    assert again == {(r.doc_id, r.split) for r in out}


def test_exact_count_split_single_exchange(spark):
    import pandas as pd

    from extractors_metadata_spark.operators.sampling import exact_count_split

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "lang": ["x"] * 20})
    )
    plan = (
        exact_count_split(df, "lang", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_pack_sequences_sf001_exact_output_hash(spark):
    """Round-4's lone driver hash-red row (CORRECTNESS_r04: rows+schema green,
    hash red, locally unreproducible). The fix made bin_id PURE-INTEGER on
    both engines ((cum-n) div budget / //), removing the double-division
    detour — this pin freezes the exact sf0.01 output so any future drift in
    token_count, window order, or bin arithmetic is caught at commit time."""
    import hashlib
    import os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        _pytest.skip("sf0.01 testdata not present")
    import __spark_entry__ as entrymod

    pdf = entrymod.q_pack_sequences(spark, sf_dir).toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    assert len(pdf) == 500
    assert [str(pdf[c].dtype) for c in cols] == [
        "int64", "int64", "int64", "object", "int64"
    ]
    digest = hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()
    assert digest == (
        "99cbf68e995fe63b295a4415a0615be4e849b307d60de0301079d2700308836e"
    )


def test_bootstrap_stats_weights_and_exactness(spark):
    """Single doc: each replicate's n_docs_w IS its Poisson weight
    (0..8) and tokens_w = w * n_tok; across 32 replicates the weights
    are hash-deterministic (two runs identical) and not all equal."""
    from extractors_metadata_spark.operators.sampling import (
        bootstrap_stats,
    )

    df = spark.createDataFrame(
        [(7, "one two three four")], "doc_id long, text string"
    )
    rows = {r["rep_id"]: r for r in bootstrap_stats(df, b=32).collect()}
    assert len(rows) == 32
    for r in rows.values():
        assert 0 <= r["n_docs_w"] <= 8
        assert r["tokens_w"] == r["n_docs_w"] * 4
        assert (r["n_docs"], r["tokens"]) == (1, 4)
    again = {
        r["rep_id"]: r["n_docs_w"]
        for r in bootstrap_stats(df, b=32).collect()
    }
    assert again == {k: v["n_docs_w"] for k, v in rows.items()}
    assert len({v["n_docs_w"] for v in rows.values()}) > 1


def test_poisson_cutoffs_cdf_shape(spark):
    """Cutoffs are the scaled Poisson(1) CDF: first ~0.3679 * 2^31,
    strictly increasing, last just below 2^31 (tail mass ~1e-6)."""
    from extractors_metadata_spark.operators.sampling import (
        poisson_cutoffs,
    )

    c = poisson_cutoffs()
    assert len(c) == 8
    assert c[0] == 790015084
    assert all(a < b for a, b in zip(c, c[1:]))
    assert 2147460000 < c[-1] < 2147483648

"""KMV bottom-k sketch pins: exhaustive-group exactness, estimator
sanity on a larger key space, and merge (order/partitioning)
invariance."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmv_small_group_is_exact(spark):
    from extractors_metadata_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame(
        [(i, "a") for i in range(20)], "doc_id long, lang string"
    )
    r = kmv_sketch(df, ("lang",), "doc_id", k=64).collect()[0]
    assert (r["k_used"], r["est_distinct"], r["exact_distinct"]) == (20, 20, 20)


def test_kmv_estimate_within_tolerance(spark):
    """2000 distinct keys, k=64: KMV standard error is ~1/sqrt(k-2) ~ 13%;
    assert within 4 sigma (the hash family is fixed, so this is a frozen
    deterministic value, not a flaky statistical bound)."""
    from extractors_metadata_spark.operators.sketches import kmv_sketch

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    r = kmv_sketch(df, ("lang",), "doc_id", k=64).collect()[0]
    assert r["exact_distinct"] == 2000
    assert abs(r["est_distinct"] - 2000) / 2000 < 0.52
    assert r["k_used"] == 64


def test_kmv_partitioning_invariant(spark):
    """Same keys under 1 vs 16 partitions -> identical sketch row
    (bottom-k is a semilattice merge; nothing order-dependent)."""
    from extractors_metadata_spark.operators.sketches import kmv_sketch

    base = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("de").alias("lang")
    )
    a = kmv_sketch(base.coalesce(1), ("lang",), "doc_id", k=64).collect()[0]
    b = kmv_sketch(base.repartition(16), ("lang",), "doc_id", k=64).collect()[0]
    assert a.asDict() == b.asDict()

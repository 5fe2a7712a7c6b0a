"""Deterministic data mixing (operators/sampling.mix_sources).

Contracts: the kept subset is a pure function of the rows (re-runs are
identical), unweighted groups are dropped, achieved group sizes track the
exact integer targets k_s = floor(w_s * N / W) closely (mix31-uniform
hash), and the binding group is fully consumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.sampling import mix_sources


def _corpus(spark):
    # uneven groups: a=10000, b=5000, c=5000, plus an unweighted group x
    return spark.range(21000).select(
        F.col("id"),
        F.when(F.col("id") < 10000, "a")
        .when(F.col("id") < 15000, "b")
        .when(F.col("id") < 20000, "c")
        .otherwise("x")
        .alias("grp"),
    )


WEIGHTS = {"a": 2, "b": 2, "c": 1}  # W=5 -> N=12500, k=(5000, 5000, 2500)


def test_mix_targets_and_determinism(spark):
    df = _corpus(spark)
    out = mix_sources(df, "grp", WEIGHTS, "id")
    sizes = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert "x" not in sizes  # unweighted group dropped
    # k_a=5000 of 10000, k_b=5000 of 5000 (binding), k_c=2500 of 5000
    assert sizes["b"] == 5000  # threshold = 2^31 exactly -> keep all
    assert abs(sizes["a"] - 5000) / 5000 < 0.03
    assert abs(sizes["c"] - 2500) / 2500 < 0.04
    # pure function of the rows: identical on re-run
    again = mix_sources(df, "grp", WEIGHTS, "id")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_mix_subset_and_empty_weights(spark):
    df = _corpus(spark)
    out = mix_sources(df, "grp", WEIGHTS, "id")
    assert out.join(df, ["id", "grp"], "left_anti").count() == 0  # subset
    none = mix_sources(df, "grp", {"zzz": 1}, "id")
    assert none.count() == 0

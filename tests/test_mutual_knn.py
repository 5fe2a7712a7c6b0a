"""Mutual-kNN graph (operators/similarity.mutual_knn): reciprocity filter
closed-form; the driver oracle (mutual_knn) covers scale + replay."""

from __future__ import annotations


def test_hub_edge_kept_only_when_reciprocated(spark):
    from extractors_metadata_spark.operators.similarity import mutual_knn

    # v1 and v2 both point at hub v0; v0's top-1 tie (v1 vs v2, equal
    # cosine) breaks to the smaller id -> only (0, 1) is mutual at k=1
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.9, -0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mutual_knn(df, k=1).collect()
    assert [(r["id_a"], r["id_b"], r["rank_ab"], r["rank_ba"]) for r in out] == [
        (0, 1, 1, 1)
    ]

"""Hand goldens for knn_classify: majority vote, the smaller-label
tie-break, and self-exclusion."""

from __future__ import annotations


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_vote_and_tiebreak(spark):
    from extractors_metadata_spark.operators.similarity import knn_classify

    corpus = _emb(
        spark,
        [
            # cluster around (1, 0): query 0 (label 0), two label-1 dupes
            # and one label-2 straggler
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.01], 1),
            (2, [1.0, 0.02], 1),
            (3, [0.9, 0.1], 2),
            # cluster around (0, 1): query 10 (label 0) with one label-3
            # and one label-2 neighbor -> 1-1 vote tie at k=2
            (10, [0.0, 1.0], 0),
            (11, [0.01, 1.0], 3),
            (12, [0.02, 1.0], 2),
        ],
    )
    queries = corpus.filter("vec_id in (0, 10)")
    out = {
        (r["true_label"], r["pred_label"]): r["n_queries"]
        for r in knn_classify(queries, corpus, k=2).collect()
    }
    # query 0: nearest two are vec 1 and vec 2 (self excluded) -> pred 1;
    # query 10: nearest two are vec 11 (label 3) and vec 12 (label 2),
    # 1-1 tie -> smaller label 2
    assert out == {(0, 1): 1, (0, 2): 1}

"""Int8 scalar quantization for ANN (operators/similarity.sq_encode/sq_topk).

Contracts: quantized vectors reconstruct within the scale bound, the
quantized cosine tracks the exact cosine closely (max-abs int8 keeps
direction), and top-k recall vs exact brute force stays high.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.similarity import (
    brute_force_topk,
    sq_encode,
    sq_topk,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_sq_encode_reconstruction_bound(spark):
    emb = _emb(spark)
    enc = sq_encode(emb).join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    # |v_i - q_i * scale| <= scale/2 element-wise (HALF_EVEN rounding)
    err = enc.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("qvec"),
                lambda v, q: F.abs(v - q * F.col("scale")) / F.col("scale"),
            )
        ).alias("rel")
    )
    assert err.agg(F.max("rel")).first()[0] <= 0.5 + 1e-9
    # int8 range respected
    rng = sq_encode(emb).select(
        F.array_max(F.transform("qvec", lambda q: F.abs(q))).alias("m")
    )
    assert rng.agg(F.max("m")).first()[0] <= 127


def test_sq_topk_recall_vs_exact(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(queries, emb, k=5)
    approx = sq_topk(queries, emb, k=5)
    hits = exact.select("query_id", "neighbor_id").intersect(
        approx.select("query_id", "neighbor_id")
    )
    recall = hits.count() / exact.count()
    assert recall >= 0.9, recall
    # the quantized sim is close to the exact one for matched pairs
    both = exact.join(approx, ["query_id", "neighbor_id"]).select(
        F.abs(F.col("sim") - F.col("qsim")).alias("d")
    )
    assert both.agg(F.max("d")).first()[0] < 0.02


def test_embedding_centroids_exact_and_partition_invariant(spark):
    import numpy as np

    from extractors_metadata_spark.operators.similarity import (
        embedding_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = {
        (r.label, r.dim): (r.n, r.sum_u, r.mean)
        for r in embedding_centroids(emb).collect()
    }
    # NumPy reference with the identical micro-unit rounding
    rows = emb.collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            np.asarray(r.embedding, np.float64)
        )
    for lab, vecs in by_label.items():
        m = np.stack(vecs)
        sum_u = np.rint(m * 1e6).astype(np.int64).sum(axis=0)
        for d in range(m.shape[1]):
            n, su, mean = got[(lab, d)]
            assert n == len(vecs) and su == sum_u[d]
            assert mean == float(su) / (float(n) * 1e6)
    # bit-identical under a different partitioning (the determinism claim)
    again = {
        (r.label, r.dim): (r.n, r.sum_u, r.mean)
        for r in embedding_centroids(emb.repartition(17)).collect()
    }
    assert again == got

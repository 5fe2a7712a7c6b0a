"""Exact-integer power iteration — the corpus embedding cloud's principal axis.

Engine-added capability: the top eigenvector of the (uncentered) Gram matrix
Q^T Q of the quantized embedding table — the dominant direction of the
embedding cloud (drift monitoring between snapshots, PCA-style whitening
prep, the spectral component of embedding-space diagnostics).

Why EXACT INTEGER: float power iteration is doubly order-dependent (both
matvec sums fold in shuffle order), so two cluster sizes produce different
bits and no exact oracle can exist.  Here:

- embeddings quantize ONCE to int64 milli-units (q = round_even(v * 1000) —
  the quantize-once rule; int8-dot precedent from mmr_select);
- the iterate u is an int64 vector renormalized by a POWER-OF-TWO shift
  chosen from the max-magnitude bit length (target band [2^19, 2^20)), so
  renormalization is exact division, never a float norm (the decay_score
  power-of-two identity);
- both matvecs are integer sum-products: with |q| <= 580, max|u| < 2^20 and
  n <= 10^7 vectors, s = Qu <= 64 * 580 * 2^20 ~ 3.9e10 and
  t = Q^T s <= n * 580 * s_max — inside int64 up to n ~ 4e8 per partition-
  independent total (beyond that, widen the shift target band);
- truncation is sign * (abs div 2^k) on BOTH engines (Spark `div` truncates
  toward zero while DuckDB `//` floors — the explicit sign split makes the
  semantics identical).

Scale design (10^9+ vectors): quantization is one codegen projection; per
round the s matvec is a zip_with/aggregate against the 64-LITERAL u array
(pure codegen, zero shuffle), the t matvec is one narrow (j, qv*s) explode
with map-side combine into 64 groups, and the only driver traffic is the
bounded 64-row collect of t (the per-round scalar precedent).  Rounds are a
fixed small k; convergence is geometric in the spectral gap.

Reference analog: none; completes the embedding suite (ann/srp/ivf/mmr/
centroid drift) with its spectral statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

U_TARGET_BITS = 20  # renormalize max |u| into [2^19, 2^20)


def principal_axis(
    emb: DataFrame,
    rounds: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(dim, u_fp): the un-normalized principal axis of Q^T Q after
    ``rounds`` exact-integer power iterations from u0 = 2^19 * ones.
    Direction is deterministic (exact arithmetic + fixed start); the unit
    axis is u_fp / ||u_fp|| consumer-side."""
    q = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.bround(x * 1000, 0).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)
    qexp = q.select(
        "vec_id", F.posexplode("q").alias("j", "qv")
    ).localCheckpoint(eager=True)

    u = [1 << (U_TARGET_BITS - 1)] * dim
    for _ in range(int(rounds)):
        u_arr = F.array(*[F.lit(int(x)) for x in u])
        s = q.select(
            "vec_id",
            F.aggregate(
                F.zip_with("q", u_arr, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("s"),
        )
        t_rows = (
            qexp.join(s, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("qv") * F.col("s")).alias("t"))
            .collect()  # bounded: exactly `dim` rows
        )
        t = [0] * dim
        for r in t_rows:
            t[r["j"]] = r["t"]
        m = max(abs(x) for x in t)
        if m == 0:
            break
        sh = max(m.bit_length() - U_TARGET_BITS, 0)
        u = [(-((-x) >> sh) if x < 0 else (x >> sh)) for x in t]

    spark = emb.sparkSession
    return spark.createDataFrame(
        [(j, int(u[j])) for j in range(dim)], "dim long, u_fp long"
    )

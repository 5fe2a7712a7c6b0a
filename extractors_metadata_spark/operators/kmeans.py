"""Distributed k-means (Lloyd) in exact integer arithmetic.

The iterative-ML credential of the engine: cluster the embedding table with
k centroids for a FIXED number of Lloyd rounds, every step exact int64
arithmetic, so the result is bit-identical under any partitioning/ordering
AND fully replayable by the DuckDB oracle (unrolled CTE stages — the same
strategy as the Hilbert/PageRank oracles).

Determinism design (the reason this is integers, not floats):
- vectors quantize ONCE: q = round_even(double(x) * SCALE) + OFFSET — the
  engine's fixed-point recipe (np.rint == round_even; exact FLOAT->DOUBLE
  cast), OFFSET shifts coords nonnegative so integer division below is
  floor division in every engine;
- init: the k seed vectors are the k smallest mix31(poly('km:' || vec_id))
  hashes (vec_id tiebreak) — a verifiable-hash sample, no RNG;
- assignment: argmin_c sum_d (v_d - c_d)^2 over k centroids — int64 NumPy
  in ONE Arrow pass per round (k x dim matmul per batch); ties -> smallest
  centroid id (np.argmin first-hit);
- update: per-(cluster, dim) integer sums via a narrow posexplode +
  map-side-combining groupBy (k*dim groups — the Exchange moves k*dim rows
  per partition, not the data), then the new coordinate is the HALF-EVEN
  integer division round(S/n): q0 = S div n, r = S mod n, bump if
  2r > n or (2r == n and q0 odd) — pure integer, engine-agnostic;
- empty clusters keep their previous centroid (defined, replayable).

Scale design: per round = one Arrow pass over the data + one k*dim-group
aggregate; centroids (k x dim ints, e.g. 8 x 64) sync through the driver —
the standard Lloyd broadcast point, same bounded shape as IVF training
(`similarity.py`). Rounds are a fixed small constant (anytime algorithm);
the data is persisted once (quantized ints), never re-read from parquet.

Reference analog: none — engine-added (ANN/IVF training path made exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vhash import mix31, poly_hash

SCALE = 10_000.0
OFFSET = 10_000  # shifts quantized coords nonnegative — PRECONDITION
# |x| <= OFFSET/SCALE (= 1.0). Nonnegativity matters because integer
# division TRUNCATES toward zero in both engines (measured: DuckDB
# (-7)//2 = -3), so floor == truncate only holds for nonnegative sums;
# the half-even rounding below is engine-exact only in that regime.


def _half_even_div(s: int, n: int) -> int:
    """round-half-even(s / n) for s >= 0, n > 0 — pure integer."""
    q, r = divmod(s, n)
    if 2 * r > n or (2 * r == n and q % 2 == 1):
        return q + 1
    return q


def quantize(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, v: array<long>) — round_even(double(x) * SCALE) + OFFSET."""
    v = F.transform(
        F.col(vec_col),
        lambda x: F.bround(x.cast("double") * F.lit(SCALE), 0).cast("long")
        + F.lit(OFFSET),
    )
    return df.select(F.col(id_col).alias("vec_id"), v.alias("v"))


def _seed_centroids(q: DataFrame, k: int) -> list[list[int]]:
    """k hash-ranked seed vectors (bounded TakeOrdered — k rows collect)."""
    h = mix31(poly_hash(F.concat(F.lit("km:"), F.col("vec_id").cast("string"))))
    rows = (
        q.withColumn("_h", h)
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    )
    return [list(r.v) for r in rows]


def _assign_udf(cents: list[list[int]]):
    c = np.asarray(cents, dtype=np.int64)  # (k, dim)

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        a = np.asarray(vs.tolist(), dtype=np.int64)  # (n, dim)
        # exact int64: |a-c|^2 expanded per centroid, k x n distances
        d2 = ((a[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return assign


def kmeans_assign(
    spark: SparkSession,
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Run ``iters`` exact Lloyd rounds; returns (vec_id, cluster, d2) with
    ``cluster`` the final assignment and ``d2`` the exact squared integer
    distance to the final centroid."""
    from .pip_knn import _cache_scoped

    q = _cache_scoped("kmeans_q", quantize(df, vec_col, id_col))
    cents = _seed_centroids(q, k)
    for _ in range(iters):
        assigned = q.select(
            "vec_id", "v", _assign_udf(cents)("v").alias("cluster")
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_c: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_c.setdefault(r.cluster, {})[r.pos] = (r.s, r.n)
        cents = [
            [
                _half_even_div(*by_c[ci][d]) if ci in by_c else cents[ci][d]
                for d in range(len(cents[ci]))
            ]
            for ci in range(k)
        ]
    c = np.asarray(cents, dtype=np.int64)

    @F.pandas_udf("long")
    def final_d2(vs: pd.Series, cl: pd.Series) -> pd.Series:
        a = np.asarray(vs.tolist(), dtype=np.int64)
        cc = c[cl.to_numpy(np.int64)]
        return pd.Series(((a - cc) ** 2).sum(axis=1))

    return q.select(
        "vec_id", "v", _assign_udf(cents)("v").alias("cluster")
    ).select("vec_id", "cluster", final_d2("v", "cluster").alias("d2"))

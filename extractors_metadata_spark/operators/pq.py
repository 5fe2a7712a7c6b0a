"""Product quantization (PQ) for ANN: integer-exact encode + ADC search.

The ANN-suite compression path (complements `similarity.py` IVF and the
int8 scalar quantization `sq_topk`): split the embedding into ``m``
subspaces, quantize each slice to its nearest codebook centroid (one code
in [0, k)), and answer queries with Asymmetric Distance Computation — the
query stays exact while database vectors cost m bytes, and each query
precomputes an (m x k) distance table so scoring a vector is m table
lookups + adds, never a d-dim dot product.

Everything runs in the engine's exact-integer regime (the kmeans.py
quantization): d^2 values are exact int64, argmin ties break to the
smallest code, so encode/ADC are bit-identical under any partitioning AND
fully SQL-replayable.  Codebooks here are the hash-ranked seed vectors'
slices (mix31-verifiable sample — the oracle replays them); production
would train each subspace with ``kmeans.kmeans_assign`` (already proven)
— the PQ mechanics are what this module adds.

Scale design: codebooks and query tables are tiny driver-side constants
(m*k*subdim and q*m*k ints) broadcast in UDF closures; encode is ONE
Arrow pass over the data (m argmins per row, vectorized); ADC scoring is
one Arrow pass over (vector x query) code lookups with the fan-out
bounded by |queries|; top-k via per-query window over the scored frame.

Reference analog: none — engine-added (ANN at 10^12 vectors needs the
m-byte representation; floats-per-vector do not fit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vhash import mix31, poly_hash
from .kmeans import quantize


def _seed_ids(q: DataFrame, n: int, salt: str) -> list[int]:
    h = mix31(poly_hash(F.concat(F.lit(salt + ":"), F.col("vec_id").cast("string"))))
    rows = (
        q.withColumn("_h", h)
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(n)
        .collect()
    )
    return [int(r.vec_id) for r in rows]


def _collect_vecs(q: DataFrame, ids: list[int]) -> np.ndarray:
    rows = {r.vec_id: list(r.v) for r in q.filter(F.col("vec_id").isin(ids)).collect()}
    return np.asarray([rows[i] for i in ids], dtype=np.int64)


def pq_topk(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    n_queries: int = 5,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, adc, rank): ADC top-``topk`` per query under the
    seed-codebook PQ; query vectors are themselves hash-ranked rows
    (salt 'pqq'), codebooks the 'pq'-ranked rows' slices."""
    q = quantize(df, vec_col, id_col)
    dim = len(q.select("v").first().v)
    assert dim % m == 0
    sub = dim // m
    cb_ids = _seed_ids(q, k, "pq")
    qy_ids = _seed_ids(q, n_queries, "pqq")
    cb = _collect_vecs(q, cb_ids).reshape(k, m, sub)  # (k, m, sub)
    qv = _collect_vecs(q, qy_ids).reshape(n_queries, m, sub)

    # (queries, m, k) ADC tables: exact int64 squared distances
    tables = ((qv[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    tables = np.transpose(tables, (0, 2, 1))  # (q, m, k)
    cbt = np.transpose(cb, (1, 0, 2))  # (m, k, sub)

    @F.pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        a = np.asarray(vs.tolist(), dtype=np.int64).reshape(-1, m, sub)
        codes = np.empty((len(a), m), dtype=np.int32)
        for j in range(m):
            d2 = ((a[:, None, j, :] - cbt[None, j, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    enc = df.sparkSession.createDataFrame(
        pd.DataFrame({"query_id": qy_ids})
    ).crossJoin(q.select("vec_id", encode("v").alias("codes")))

    @F.pandas_udf("long")
    def adc(qid: pd.Series, codes: pd.Series) -> pd.Series:
        qi = qid.to_numpy(np.int64)
        c = np.asarray(codes.tolist(), dtype=np.int64)  # (n, m)
        order = {v: i for i, v in enumerate(qy_ids)}  # query id -> table row
        idx = np.fromiter((order[int(x)] for x in qi), dtype=np.int64, count=len(qi))
        t = tables[idx]  # (n, m, k)
        return pd.Series(t[np.arange(len(c))[:, None], np.arange(m)[None, :], c].sum(axis=1))

    scored = enc.select(
        "query_id", "vec_id", adc("query_id", "codes").alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id", "adc", "rank")
    )


def pq_recall(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    n_queries: int = 5,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Self-measuring retrieval quality: recall@topk of the PQ/ADC answer
    against the EXACT integer-L2 top-k on the same quantized vectors and
    the same hash-ranked queries -> (query_id, hits).  The evaluation is
    itself an engine query (exact ints end to end), so index quality is a
    monitorable, oracle-checkable table — not an offline notebook number.

    Scale: the exact side cross-joins the TINY broadcast query set against
    the vectors (|queries| fan-out, JVM zip_with d2 — no UDF) — the same
    bounded shape as ann brute force; the semi-join and per-query count
    are query-dim sized."""
    approx = pq_topk(df, m, k, n_queries, topk, vec_col, id_col)
    q = quantize(df, vec_col, id_col)
    qy_ids = _seed_ids(q, n_queries, "pqq")
    qvecs = q.filter(F.col("vec_id").isin(qy_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    exact = (
        q.crossJoin(F.broadcast(qvecs))
        .select("query_id", "vec_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("query_id", "vec_id")
    )
    hit = approx.join(exact, ["query_id", "vec_id"], "left_semi")
    return (
        approx.select("query_id")
        .distinct()
        .join(
            hit.groupBy("query_id").agg(F.count(F.lit(1)).alias("hits")),
            "query_id",
            "left",
        )
        .select(
            "query_id", F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits")
        )
    )

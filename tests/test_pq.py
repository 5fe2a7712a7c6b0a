"""Product quantization ANN (operators/pq.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.pq import pq_topk
from extractors_metadata_spark.operators.kmeans import OFFSET, SCALE
from extractors_metadata_spark.functions.vhash import P31


def _emb(spark, n=80, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.uniform(-0.9, 0.9, size=(n, dim)).astype(np.float32)
    return (
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(n),
                    "embedding": [list(map(float, v)) for v in vecs],
                }
            )
        ),
        vecs,
    )


def _poly(s):
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % P31
    return h


def _mix31(z):
    z ^= z >> 16
    z = (z * 0x85EBCA6B) % (1 << 31)
    z ^= z >> 13
    z = (z * 0xC2B2AE35) % (1 << 31)
    return z ^ (z >> 16)


def test_matches_numpy_replay(spark):
    df, vecs = _emb(spark)
    m, k, nq, topk = 2, 4, 3, 5
    out = pq_topk(df, m=m, k=k, n_queries=nq, topk=topk)
    rows = [(r.query_id, r.vec_id, r.adc, r.rank) for r in out.collect()]

    q = np.rint(vecs.astype(np.float64) * SCALE).astype(np.int64) + OFFSET
    ids = np.arange(len(vecs))

    def ranked(salt, n):
        hs = np.array([_mix31(_poly(f"{salt}:{i}")) for i in ids])
        return ids[np.lexsort((ids, hs))][:n].tolist()

    cb_ids, qy_ids = ranked("pq", k), ranked("pqq", nq)
    sub = vecs.shape[1] // m
    cb = q[cb_ids].reshape(k, m, sub)
    codes = np.empty((len(q), m), dtype=np.int64)
    for j in range(m):
        d2 = ((q[:, None, j * sub : (j + 1) * sub] - cb[None, :, j, :]) ** 2).sum(2)
        codes[:, j] = np.argmin(d2, axis=1)
    want = []
    for qid in qy_ids:
        qv = q[qid].reshape(m, sub)
        tab = ((qv[None, :, :] - cb[:, :, :]) ** 2).sum(2)  # (k, m)
        adc = tab[codes, np.arange(m)[None, :]].sum(1)
        order = np.lexsort((ids, adc))[:topk]
        want += [(qid, int(i), int(adc[i]), r + 1) for r, i in enumerate(order)]
    assert sorted(rows) == sorted(want)


def test_self_query_ranks_first(spark):
    # a query vector's own code reconstruction is the ADC minimizer for
    # itself in most cases; weaker invariant: deterministic + full ranks
    df, _ = _emb(spark, n=40)
    out = pq_topk(df, m=2, k=8, n_queries=2, topk=40)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rows in per_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, 41))
        adcs = [r.adc for r in sorted(rows, key=lambda r: r.rank)]
        assert adcs == sorted(adcs)

"""Content-defined chunking (operators/cdc.py): the edit-locality property
(the reason CDC exists), short/empty-doc edges, and kernel<->oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def texts():
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    base = " ".join(rng.choice(words) for _ in range(150))
    # one-char edit in the middle; prefix/suffix chunks must survive
    mid = len(base) // 2
    edited = base[:mid] + "X" + base[mid + 1:]
    return base, edited


def test_cdc_edit_locality(spark, texts):
    from extractors_metadata_spark.operators.cdc import cdc_chunks

    base, edited = texts
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    ch = cdc_chunks(df).toPandas()
    fps = {d: set(g["chunk_fp"]) for d, g in ch.groupby("doc_id")}
    shared = fps[0] & fps[1]
    # a local edit must leave MOST chunks identical (fixed-size chunking
    # would share zero chunks after the global byte shift)
    assert len(shared) >= max(2, len(fps[0]) // 2), (len(shared), len(fps[0]))
    assert fps[0] != fps[1]  # the edited chunk itself differs


def test_cdc_short_and_empty_docs(spark):
    from extractors_metadata_spark.operators.cdc import cdc_chunks

    df = spark.createDataFrame(
        [(0, ""), (1, "tiny"), (2, "exactly7")], "doc_id long, text string"
    )
    ch = cdc_chunks(df).toPandas().sort_values("doc_id")
    # empty doc: no chunks; sub-gram docs: one whole-doc chunk
    assert ch["doc_id"].tolist() == [1, 2]
    assert ch["start"].tolist() == [0, 0]
    assert ch["len"].tolist() == [4, 8]


def test_cdc_oracle_parity_hand_corpus(spark, texts):
    import oracles
    from extractors_metadata_spark.operators.cdc import cdc_chunks

    base, edited = texts
    rows = [(0, base), (1, edited), (2, ""), (3, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        cdc_chunks(df).toPandas()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}))
    want = (
        con.execute(oracles._RABIN_CHUNKS_SQL).df()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("doc_id", "chunk_idx", "start", "len", "chunk_fp"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c

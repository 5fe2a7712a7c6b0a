"""Streaming inverted-index maintenance (streaming/index_stream.py):
the streamed index read equals the one-shot batch index; the batch-id
guard blocks duplicate postings on replay."""

from __future__ import annotations

import pandas as pd

from extractors_metadata_spark.operators.index_build import inverted_index
from extractors_metadata_spark.sources import snapshot as snap
from extractors_metadata_spark.streaming.index_stream import (
    read_index,
    stream_inverted_index,
)


def _docs(spark, n=60):
    words = ["alpha", "beta", "gamma", "delta", "common"]
    rows = [
        (i, " ".join(words[j % 5] for j in range(i, i + 6)) + " common")
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _key(rows):
    return sorted(
        (r.word, r.df_docs, r.doc_id, tuple(r.positions), r.n_hits)
        for r in rows
    )


def test_streamed_index_equals_batch_and_guard_blocks_replay(spark, tmp_path):
    docs = _docs(spark)
    docs.repartition(6).write.parquet(str(tmp_path / "in"))
    state = str(tmp_path / "state")
    q = stream_inverted_index(
        spark, str(tmp_path / "in"), state, str(tmp_path / "ckpt"),
        schema=docs.schema, max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    # multiple micro-batches actually happened (appends, not one commit)
    snaps = snap.live_snapshots(state)
    assert len(snaps) >= 2
    got = _key(read_index(spark, state, max_df=50).collect())
    want = _key(inverted_index(docs, max_df=50).collect())
    assert got == want
    # replaying from a FRESH checkpoint redelivers every batch id; the
    # manifest guard must make all of them no-ops
    q2 = stream_inverted_index(
        spark, str(tmp_path / "in"), state, str(tmp_path / "ckpt2"),
        schema=docs.schema, max_files_per_trigger=2,
    )
    q2.awaitTermination(300)
    assert _key(read_index(spark, state, max_df=50).collect()) == want

"""Streaming first-arrival-wins dedup (streaming/dedup_stream.py)."""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.sources.snapshot import read_table
from extractors_metadata_spark.streaming.dedup_stream import (
    first_wins_merge,
    stream_first_wins,
)


def _feed(spark, n=60, keys=7):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "key": [i % keys for i in range(n)],
                "arrival": list(range(n)),
                "payload": [f"p{i}" for i in range(n)],
            }
        )
    )


def test_streamed_equals_oneshot_first_wins(spark):
    base = tempfile.mkdtemp(prefix="dedstr_")
    feed = _feed(spark)
    feed.repartition(6).write.parquet(base + "/in")
    q = stream_first_wins(
        spark, base + "/in", base + "/state", base + "/ckpt",
        schema=feed.schema, key_col="key",
        ordered_cols=["arrival", "payload"], max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    got = {
        r.key: (r.arrival, r.payload)
        for r in read_table(spark, base + "/state").collect()
    }
    # first sighting of key k is arrival k itself (i % 7 cycles)
    assert got == {k: (k, f"p{k}") for k in range(7)}


def test_first_wins_merge_idempotent_and_order_free(spark):
    a = _feed(spark, n=20)
    b = _feed(spark, n=40).filter(F.col("arrival") >= 20)
    ab = first_wins_merge(
        first_wins_merge(None, a, "key", ["arrival", "payload"]),
        b, "key", ["arrival", "payload"],
    )
    ba = first_wins_merge(
        first_wins_merge(None, b, "key", ["arrival", "payload"]),
        a, "key", ["arrival", "payload"],
    )
    redelivered = first_wins_merge(ab, a, "key", ["arrival", "payload"])
    want = sorted((r.key, r.arrival, r.payload) for r in ab.collect())
    assert sorted((r.key, r.arrival, r.payload) for r in ba.collect()) == want
    assert (
        sorted((r.key, r.arrival, r.payload) for r in redelivered.collect())
        == want
    )

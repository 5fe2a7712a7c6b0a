"""Streaming last-write-wins upsert (streaming/upsert_stream.py)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.sources.snapshot import read_table
from extractors_metadata_spark.streaming.upsert_stream import (
    stream_upsert,
    upsert_merge,
)


def _feed(spark, n=60, keys=7):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "key": [i % keys for i in range(n)],
                "version": list(range(n)),
                "payload": [f"p{i}" for i in range(n)],
            }
        )
    )


def test_streamed_equals_oneshot(spark):
    base = tempfile.mkdtemp(prefix="upsstr_")
    feed = _feed(spark)
    feed.repartition(6).write.parquet(base + "/in")
    q = stream_upsert(
        spark, base + "/in", base + "/state", base + "/ckpt",
        schema=feed.schema, key_col="key", ordered_cols=["version", "payload"],
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    got = {
        r.key: (r.version, r.payload)
        for r in read_table(spark, base + "/state").collect()
    }
    want = {k: (v, f"p{v}") for k in range(7) for v in [max(i for i in range(60) if i % 7 == k)]}
    assert got == want


def test_merge_idempotent_and_commutative(spark):
    a = _feed(spark, n=20)
    b = _feed(spark, n=40).filter(F.col("version") >= 20)
    cols = ["version", "payload"]
    ab = upsert_merge(upsert_merge(None, a, "key", cols), b, "key", cols)
    ba = upsert_merge(upsert_merge(None, b, "key", cols), a, "key", cols)
    twice = upsert_merge(ab, b, "key", cols)  # redelivery of b
    as_set = lambda df: sorted(map(tuple, df.collect()))
    assert as_set(ab) == as_set(ba) == as_set(twice)


def test_state_is_time_travelable(spark):
    base = tempfile.mkdtemp(prefix="upsstr2_")
    feed = _feed(spark, n=30)
    feed.repartition(5).write.parquet(base + "/in")
    q = stream_upsert(
        spark, base + "/in", base + "/state", base + "/ckpt",
        schema=feed.schema, key_col="key", ordered_cols=["version", "payload"],
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    # multiple replace snapshots committed; each is readable
    snaps = [
        d
        for d in os.listdir(base + "/state/snapshots")
        if d.startswith("snap-")
    ]
    assert len(snaps) >= 2
    final = read_table(spark, base + "/state")
    assert final.groupBy("key").count().filter("count > 1").count() == 0

"""Continuous sketch maintenance (streaming/sketch_stream.py).

The delivery-semantics contracts: HLL state survives redelivery unchanged
(max-merge idempotence = exactly-once for free), count-min needs — and
gets — the manifest batch-id guard; both states equal the batch-mode
sketch of everything that flowed through, and stay time-travelable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.sketches import (
    cms_sketch,
    hll_estimate,
    hll_sketch,
)
from extractors_metadata_spark.sources import snapshot as snap
from extractors_metadata_spark.synth import synth_webpages


def test_stream_hll_equals_batch_and_survives_redelivery(
    spark, tmp_path_factory
):
    from extractors_metadata_spark.streaming.sketch_stream import (
        stream_hll_distinct,
    )

    base = tmp_path_factory.mktemp("shll")
    input_dir, table, ckpt = str(base / "in"), str(base / "t"), str(base / "c")

    pages = synth_webpages(spark, 200)
    doc_id = F.element_at(F.split("url", "/"), -1).cast("long")
    first, second = pages.filter(doc_id < 120), pages.filter(doc_id >= 120)

    first.write.parquet(input_dir)
    q = stream_hll_distinct(spark, input_dir, table, ckpt, p=8)
    q.awaitTermination(300)

    # batch-equivalence: streamed registers == one-shot sketch of the same rows
    regs1 = sorted(map(tuple, snap.read_table(spark, table).collect()))
    assert regs1 == sorted(
        map(tuple, hll_sketch(first, F.col("url"), p=8).collect())
    )
    run1_last = max(m["snapshot_id"] for m in snap.live_snapshots(table))

    # redelivery: first 120 AGAIN plus the 80 new — max-merge must land on
    # exactly the whole-corpus sketch (idempotence, no double anything)
    first.write.mode("append").parquet(input_dir)
    second.write.mode("append").parquet(input_dir)
    q2 = stream_hll_distinct(spark, input_dir, table, ckpt, p=8)
    q2.awaitTermination(300)

    regs2 = snap.read_table(spark, table)
    assert sorted(map(tuple, regs2.collect())) == sorted(
        map(tuple, hll_sketch(pages, F.col("url"), p=8).collect())
    )
    # estimate lands near the true 200 distinct urls
    est = hll_estimate(regs2, p=8).first()["estimate"]
    assert abs(est - 200) / 200 < 0.15

    # time travel: the state as of run 1's final batch is still readable
    old = snap.read_table(spark, table, as_of=run1_last)
    assert sorted(map(tuple, old.collect())) == regs1


def test_stream_cms_batch_guard_blocks_double_count(spark, tmp_path_factory):
    from extractors_metadata_spark.streaming.sketch_stream import (
        stream_cms_counts,
    )

    base = tmp_path_factory.mktemp("scms")
    input_dir, table, ckpt = str(base / "in"), str(base / "t"), str(base / "c")

    pages = synth_webpages(spark, 150)
    pages.write.parquet(input_dir)
    q = stream_cms_counts(spark, input_dir, table, ckpt, w=256)
    q.awaitTermination(300)

    whole = sorted(map(tuple, cms_sketch(pages, F.col("url"), w=256).collect()))
    assert sorted(map(tuple, snap.read_table(spark, table).collect())) == whole

    # a FRESH checkpoint replays batch 0 (same stable batch_id): the manifest
    # guard must skip it — counters unchanged, no extra snapshot committed
    n_snaps = len(snap.live_snapshots(table))
    q2 = stream_cms_counts(spark, input_dir, table, str(base / "c2"), w=256)
    q2.awaitTermination(300)
    assert sorted(map(tuple, snap.read_table(spark, table).collect())) == whole
    assert len(snap.live_snapshots(table)) == n_snaps

"""Continuous sketch maintenance over a document stream.

Engine-added capability: the streaming twin of ``operators/sketches.py`` —
keep a crawl-wide distinct count (HLL) and key-frequency grid (count-min)
up to date as micro-batches arrive, with DURABLE state in the snapshot
layer instead of executor memory. This is the "how many unique URLs has
the crawl seen, right now?" / "which hosts are hot?" shape: state is m
registers / d*w counters — constant-size no matter how many batches flow
through — and every batch's update cost is one narrow aggregate of that
batch plus a tiny-table merge.

Delivery semantics (the interesting part, pinned in pytest):

- **HLL is exactly-once FOR FREE under at-least-once delivery**: the merge
  is per-bucket ``max``, which is idempotent — replaying a batch after a
  crash/restart leaves the registers bit-identical. No dedup bookkeeping
  is needed, ever. (This is why register-style sketches, not counters, are
  the right durable state for redelivery-prone queues — the same argument
  as the reference's idempotent re-upload behavior, lifted to corpus
  state; cf. terraref/extractors-metadata terra_mdcleaner re-put
  semantics.)
- **Count-min is NOT idempotent** (counts add), so ``stream_cms_counts``
  records each applied ``batch_id`` in the snapshot manifest metrics and
  skips batches already applied — foreachBatch's stable batch ids turn
  at-least-once into effectively-once. The guard is read from the tiny
  manifest chain, never from the data.

Both states are ordinary snapshot tables: time-travelable (`read_table
as_of=` gives "distinct count as of snapshot N"), replace-mode commits
(state is whole-sketch, a few hundred rows), and mergeable offline with
``hll_merge``/``cms_merge`` against sketches from other pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_merge, cms_sketch, hll_merge, hll_sketch
from ..schemas import WEBPAGES
from ..sources.snapshot import (
    _load_manifest,
    _snap_ids,
    read_table,
    write_snapshot,
)


def _applied_batch_ids(table_path: str) -> set[int]:
    """Batch ids recorded across the WHOLE manifest chain — not just live
    snapshots: every state commit here is a replace, which makes only the
    newest snapshot 'live', but the applied-batch history must survive all
    of them. (``expire_snapshots`` trims that history along with time
    travel — expire only beyond the queue's redelivery horizon.)"""
    ids: set[int] = set()
    for i in _snap_ids(table_path):
        b = (_load_manifest(table_path, i).get("metrics") or {}).get("batch_id")
        if b is not None:
            ids.add(int(b))
    return ids


def stream_hll_distinct(
    spark: SparkSession,
    input_dir: str,
    state_table: str,
    checkpoint_dir: str,
    key: Column | None = None,
    p: int = 12,
    max_files_per_trigger: int = 4,
    schema=None,
):
    """Maintain an HLL register table for the stream-lifetime distinct
    count of ``key`` (default: the url column of a WEBPAGES stream; pass
    ``schema`` to sketch any other parquet stream). Each micro-batch
    sketches its own rows (shuffle <= 2^p rows) and max-merges into the
    durable register snapshot; ``hll_estimate`` over
    ``read_table(state_table)`` answers at any time, including as-of past
    snapshots."""
    key = key if key is not None else F.col("url")
    schema = schema if schema is not None else WEBPAGES

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_regs = hll_sketch(batch_df, key, p=p)
        stored = read_table(spark, state_table)
        merged = batch_regs if stored is None else hll_merge(stored, batch_regs)
        # idempotent max-merge: re-applying a replayed batch is a no-op, so
        # no batch-id guard is required (pinned in pytest)
        write_snapshot(
            merged, state_table, "replace", metrics={"batch_id": batch_id}
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_counts(
    spark: SparkSession,
    input_dir: str,
    state_table: str,
    checkpoint_dir: str,
    key: Column | None = None,
    d: int = 4,
    w: int = 1024,
    max_files_per_trigger: int = 4,
    schema=None,
):
    """Maintain a count-min grid over the stream (default key: the url
    column of a WEBPAGES stream; pass ``schema`` for any other parquet
    stream). Counts add, so redelivered batches WOULD double-count — the
    manifest batch-id guard skips any batch already applied, making the
    counter state effectively-once under at-least-once delivery."""
    key = key if key is not None else F.col("url")
    schema = schema if schema is not None else WEBPAGES

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _applied_batch_ids(state_table):
            return
        grid = cms_sketch(batch_df, key, d=d, w=w)
        stored = read_table(spark, state_table)
        merged = grid if stored is None else cms_merge(stored, grid)
        write_snapshot(
            merged, state_table, "replace", metrics={"batch_id": batch_id}
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Streaming keyed upsert: last-write-wins state maintenance.

The streaming MERGE shape: a keyed CDC-ish feed where each record carries a
monotonically meaningful ``version`` (change sequence, source LSN, document
revision), and the state table must always hold each key's HIGHEST-version
row — the live materialized "current rows" view.

Delivery semantics — the interesting part: the merge is a per-key MAX over
(version, tiebreak), which is associative, commutative and IDEMPOTENT, so
redelivered or reordered batches CANNOT corrupt state — unlike the counting
streams (tile/CMS), NO batch-id guard is needed; at-least-once delivery is
already exactly-right. That also makes the end state a pure function of
the input SET, which is what gives this stream a FULL value-hash oracle
(the one-shot per-key argmax) rather than a rows-only pass.

Scale design: each batch collapses to its own per-key winners (one
map-side-combining aggregate over the batch), then merges with the stored
state via union + the same argmax — state-table-sized work per batch,
bounded by distinct keys, never by stream length. State is an ordinary
snapshot table: time-travelable ("current rows as of snapshot N"),
compactable, readable mid-stream.

Winner rule (frozen): lexicographic max of struct(version, payload...) —
version first, then payload columns as the deterministic tiebreak, so two
records with equal versions pick the same winner in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshot import read_table, write_snapshot


def _winners(df: DataFrame, key_col: str, ordered_cols: list[str]) -> DataFrame:
    """Per-key lexicographic-max struct -> flattened winner row."""
    s = F.max(F.struct(*[F.col(c) for c in ordered_cols])).alias("_w")
    g = df.groupBy(key_col).agg(s)
    return g.select(key_col, *[F.col(f"_w.{c}").alias(c) for c in ordered_cols])


def upsert_merge(
    stored: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    ordered_cols: list[str],
) -> DataFrame:
    batch_w = _winners(batch, key_col, ordered_cols)
    if stored is None:
        return batch_w
    return _winners(stored.unionByName(batch_w), key_col, ordered_cols)


def stream_upsert(
    spark: SparkSession,
    input_dir: str,
    state_table: str,
    checkpoint_dir: str,
    schema,
    key_col: str,
    ordered_cols: list[str],
    max_files_per_trigger: int = 3,
):
    """Maintain the per-key last-write-wins table for a parquet stream.
    ``ordered_cols``: version column FIRST, then payload columns (their
    order is the frozen tiebreak)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        merged = upsert_merge(
            read_table(spark, state_table), batch_df, key_col, ordered_cols
        )
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

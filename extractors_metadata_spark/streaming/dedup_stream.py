"""Streaming exact dedup: first-arrival-wins survivor state.

The streaming twin of operators/dedup.dedup_exact — a crawl feed keyed
by content fingerprint where the FIRST sighting of each key is the
survivor and every later arrival is a duplicate to drop. The per-key
merge is a struct-MIN by (version, payload...) — associative,
commutative, IDEMPOTENT (the stream_upsert discipline with the order
flipped), so at-least-once delivery is already exactly-right and the
end state is a pure function of the input SET: exactly what makes a
full SQL oracle possible for a streaming job.

Scale shape: foreachBatch merges each micro-batch's local winners into
the snapshot state table (one key-keyed agg per batch, state read is a
snapshot scan); the state table is one row per distinct fingerprint —
the corpus's unique-content cardinality, not its row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshot import read_table, write_snapshot


def _first(df: DataFrame, key_col: str, ordered_cols: list[str]) -> DataFrame:
    payload = [c for c in df.columns if c != key_col]
    win = F.min(F.struct(*[F.col(c) for c in ordered_cols])).alias("w")
    keep = df.groupBy(key_col).agg(win)
    return keep.select(
        key_col, *[F.col(f"w.{c}").alias(c) for c in ordered_cols]
    ).select(key_col, *payload)


def first_wins_merge(
    stored: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    ordered_cols: list[str],
) -> DataFrame:
    batch_w = _first(batch, key_col, ordered_cols)
    if stored is None:
        return batch_w
    return _first(stored.unionByName(batch_w), key_col, ordered_cols)


def stream_first_wins(
    spark: SparkSession,
    input_dir: str,
    state_table: str,
    checkpoint_dir: str,
    schema,
    key_col: str,
    ordered_cols: list[str],
    max_files_per_trigger: int = 3,
):
    """Maintain the per-key first-arrival survivor table for a parquet
    stream. ``ordered_cols``: arrival/version column FIRST, then payload
    columns (their order is the frozen tiebreak)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        merged = first_wins_merge(
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

"""Stream-stream interval join (Structured Streaming's hardest join).

Two unbounded streams joined on a key within an event-time band —
enrichment shapes like "match each click to the signups of the same user
within a day".  Spark buffers BOTH sides in state; the watermark + the
time-interval join condition are what BOUND that state (rows older than
watermark + band are evicted) — without them a stream-stream join is an
unbounded-memory plan and Spark rejects it in append mode.

Correctness contract (what the oracle checks): with AvailableNow drains
and a watermark delay >= the data's maximum disorder, NO valid match is
ever evicted early, so the streamed output equals the BATCH interval join
exactly — a full value-hash oracle for a stateful dual-stream plan.  With
a tighter production watermark the join stays correct for matches within
the delay; late rows drop (monitored, not silent — Spark counts them).

Scale: state per key is bounded by rows inside (watermark + band); the
join itself shuffles both streams by the equality key — the same single
user-keyed Exchange discipline as the batch interval_join operator.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stream_interval_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    left_schema,
    right_schema,
    key_col: str = "user_id",
    band_s: int = 86_400,
    watermark: str = "3650 days",
    max_files_per_trigger: int = 3,
):
    """Inner-join two parquet streams on ``key_col`` where
    |right.ts - left.ts| <= band_s; append matches to ``out_dir``."""
    lt = (
        spark.readStream.schema(left_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(left_dir)
        .select(
            F.col(key_col),
            F.col("lid"),
            F.col("ts").cast("timestamp").alias("lts"),
        )
        .withWatermark("lts", watermark)
    )
    rt = (
        spark.readStream.schema(right_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(right_dir)
        .select(
            F.col(key_col).alias("rkey"),
            F.col("rid"),
            F.col("ts").cast("timestamp").alias("rts"),
        )
        .withWatermark("rts", watermark)
    )
    band = F.expr(f"rts >= lts - INTERVAL {band_s} SECONDS") & F.expr(
        f"rts <= lts + INTERVAL {band_s} SECONDS"
    )
    joined = lt.join(rt, (F.col(key_col) == F.col("rkey")) & band, "inner").select(
        F.col(key_col),
        "lid",
        "rid",
        F.unix_micros("lts").alias("lt_us"),
        F.unix_micros("rts").alias("rt_us"),
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

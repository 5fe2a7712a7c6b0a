"""Sliding event-time window aggregates (Spark's native F.window).

§2.4 widening: the time-series reporting shape — per-(window, key)
aggregates where windows OVERLAP (duration d, slide s, d a multiple of s:
every event lands in exactly d/s windows).  Uses Spark's built-in
``F.window`` (epoch-aligned, [start, end) half-open), so this pins the
engine's event-time windowing against an independent integer replay: the
windows containing t are exactly w_j = (t - t mod s) - j*s for
j in 0..d/s-1 (µs integer arithmetic — the DuckDB oracle's form).

Scale: the window fan-out is a constant x(d/s) Expand before ONE
map-side-combining aggregate keyed by (window, key) — same shape as a
grouping-set rollup; no UDF, no second scan. Aggregates are exactness-safe
(counts, exact distinct, half-even fixed-point value sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_window_stats(
    df: DataFrame,
    duration: str = "2 hours",
    slide: str = "30 minutes",
    key_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(window_start_us, key, n_events, n_users, value_sum_u) per sliding
    window x key."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        df.select(
            F.window(ts, duration, slide).alias("_w"),
            F.col(key_col).alias("key"),
            F.col(user_col),
            F.col(value_col),
        )
        .groupBy(F.unix_micros(F.col("_w.start")).alias("window_start_us"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(user_col).alias("n_users"),
            F.sum(
                F.bround(F.col(value_col) * 1000000.0, 0).cast("long")
            ).alias("value_sum_u"),
        )
    )

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

from pyspark.sql import DataFrame, Window
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


def rolling_user_stats(
    df: DataFrame,
    range_s: int = 7 * 86_400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-event trailing-``range_s`` rolling aggregates over the user's
    own stream (velocity/abuse/rate features): for each event, the count
    and fixed-point value sum of that user's events in the closed µs range
    [t - range_s, t] — a RANGE window frame (value-based, NOT row-based:
    gaps and bursts change row counts but not the time horizon).

    Exactness: the frame is keyed on exact µs ints and the sum is per-row
    half-even fixed point, so every engine computes the identical frame
    set and identical sums. Tie semantics are RANGE's: same-timestamp rows
    share a frame (all peers included) regardless of id tie-break — which
    is why the frame orders by µs alone.

    Plan: ONE user-keyed Exchange; the range frame is a single pass over
    each partition's sorted run (no self-join, no explode)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = df.select(
        F.col(user_col),
        F.col(id_col),
        us.alias("t_us"),
        F.bround(F.col(value_col) * 1000000.0, 0).cast("long").alias("_v"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("t_us")
        .rangeBetween(-int(range_s) * 1_000_000, 0)
    )
    return d.select(
        user_col,
        id_col,
        "t_us",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("_v").over(w).alias("v_sum_u"),
    )

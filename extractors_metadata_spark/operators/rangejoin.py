"""Temporal interval (range) join: points-in-intervals at corpus scale.

Engine-added capability (task mandate): join each timestamped row to the
intervals that contain it for the same key — attention/exposure windows
around incidents, campaign windows over clickstreams, maintenance windows
over sensor streams. Spark has no range-join optimization: the naive
``l.key = r.key AND r.lo <= l.ts <= r.hi`` theta join degenerates to a
per-key cartesian (every point against every interval of that key).

Plan — the 1-D twin of the covering-cell design in ``operators/pip_knn``
(dilate the DIM side, never the probe side):

  1. each point maps to exactly ONE time bucket (``floor(us / bucket_us)``)
     — the big side is never exploded;
  2. each interval explodes into the buckets it covers — a fan-out bounded
     by ``width / bucket_s + 1``, so sizing ``bucket_s`` near the maximum
     interval width keeps it a small constant;
  3. equi-join on ``(key, bucket)`` (hash-uniform shuffle, broadcastable
     when the interval side is small), then the exact ``lo <= ts <= hi``
     refine — each matched pair arises exactly once (the point owns one
     bucket), so no dedup pass is needed.

Determinism contract (driver oracle): bounds are inclusive on both ends in
exact int64 microseconds (``unix_micros`` == DuckDB ``epoch_us``); the
oracle is the plain SQL theta join — semantically primitive, so the bucket
decomposition is what gets checked. Intervals with ``lo > hi`` match
nothing; null timestamps/bounds drop out (inner semantics).

Reference analog: none — the reference processes one message at a time;
this generalizes its scan-interval envelope (terra_sensorposition.py
start==end scans) to cross-stream containment at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join: every (point, interval) pair with equal ``on`` key and
    ``lo <= ts <= hi`` (inclusive, exact microseconds). Returns all point
    columns plus the interval's columns (callers project/aggregate after).

    ``bucket_s`` sizes the covering buckets: interval-side fan-out is
    ``ceil(width / bucket_s) + 1`` rows per interval — set it near the
    typical interval width (an hour for hour-scale windows).
    """
    bucket_us = int(bucket_s) * 1_000_000
    pus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lous = F.unix_micros(F.col(lo_col).cast("timestamp"))
    hius = F.unix_micros(F.col(hi_col).cast("timestamp"))

    p = points.withColumn("__us", pus).withColumn(
        "__bkt", F.floor(F.col("__us") / bucket_us)
    )
    iv = (
        intervals.withColumn("__lo_us", lous)
        .withColumn("__hi_us", hius)
        .filter(F.col("__lo_us") <= F.col("__hi_us"))
        .withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo_us") / bucket_us),
                    F.floor(F.col("__hi_us") / bucket_us),
                )
            ),
        )
        .withColumnRenamed(on, "__ikey")
    )
    joined = p.join(
        iv,
        (p[on] == iv["__ikey"]) & (p["__bkt"] == iv["__bkt"]),
        "inner",
    ).filter(
        (F.col("__us") >= F.col("__lo_us")) & (F.col("__us") <= F.col("__hi_us"))
    )
    return joined.drop("__us", "__bkt", "__ikey", "__lo_us", "__hi_us")

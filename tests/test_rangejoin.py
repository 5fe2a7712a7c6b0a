"""Interval join (operators/rangejoin.py): bucket decomposition exactness.

The oracle checks it against a SQL theta join at the driver level; here the
unit contracts: inclusive bounds, bucket-straddling intervals, multi-match,
degenerate/empty intervals, and equality with the naive theta join on
random data (the decomposition must be a pure rewrite).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_inclusive_bounds_and_straddle(spark):
    points = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00")),  # == lo: in
            (2, 1, _ts("2024-01-01 13:00:00")),  # == hi: in
            (3, 1, _ts("2024-01-01 13:00:00.000001")),  # 1us past hi: out
            (4, 2, _ts("2024-01-01 11:00:00")),  # other key: out
        ],
        "point_id long, user_id long, ts timestamp",
    )
    # 10:00..13:00 straddles four hour-buckets with bucket_s=3600
    iv = spark.createDataFrame(
        [(100, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00"))],
        "interval_id long, user_id long, lo timestamp, hi timestamp",
    )
    got = sorted(
        r["point_id"]
        for r in interval_join(points, iv, bucket_s=3600).collect()
    )
    assert got == [1, 2]


def test_multi_interval_match_no_dupes(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:30:00"))],
        "point_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (101, 1, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 12:00:00")),
            (102, 1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00")),
        ],
        "interval_id long, user_id long, lo timestamp, hi timestamp",
    )
    rows = interval_join(points, iv, bucket_s=3600).collect()
    # one row per containing interval, never duplicated across buckets
    assert sorted(r["interval_id"] for r in rows) == [100, 101]


def test_degenerate_and_inverted_intervals(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))],
        "point_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            # start == end == point ts: matches (reference scan-interval shape)
            (100, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:00:00")),
            (101, 1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 09:00:00")),
        ],
        "interval_id long, user_id long, lo timestamp, hi timestamp",
    )
    rows = interval_join(points, iv, bucket_s=3600).collect()
    assert [r["interval_id"] for r in rows] == [100]


def test_equals_naive_theta_join_random(spark):
    # decomposition is a pure rewrite: equality with the naive theta join
    base = _ts("2024-01-01 00:00:00")
    points = spark.createDataFrame(
        [
            (i, i % 5, base + dt.timedelta(minutes=(i * 37) % (7 * 24 * 60)))
            for i in range(300)
        ],
        "point_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (
                j,
                j % 5,
                base + dt.timedelta(minutes=(j * 113) % (7 * 24 * 60)),
                base
                + dt.timedelta(
                    minutes=(j * 113) % (7 * 24 * 60) + (j * 29) % 360
                ),
            )
            for j in range(60)
        ],
        "interval_id long, user_id long, lo timestamp, hi timestamp",
    )
    fast = {
        (r["point_id"], r["interval_id"])
        for r in interval_join(points, iv, bucket_s=3600).collect()
    }
    naive = {
        (r["point_id"], r["interval_id"])
        for r in points.alias("p")
        .join(
            iv.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.lo"))
            & (F.col("p.ts") <= F.col("i.hi")),
        )
        .collect()
    }
    assert fast == naive and len(fast) > 50


def test_probe_side_is_never_exploded(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))],
        "point_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(100, 1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "interval_id long, user_id long, lo timestamp, hi timestamp",
    )
    plan = interval_join(points, iv, bucket_s=3600)._jdf.queryExecution().executedPlan().toString()
    # exactly one Generate (the interval-side explode)
    assert plan.count("Generate") == 1

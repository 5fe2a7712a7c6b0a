"""Gap-based sessionization (operators/sessions.py).

Pins the determinism contract the driver oracle relies on: strict-> gap
splits in exact microseconds, (ts, id) tie-break, 1-based per-user sequence,
exact decimal value sums — plus the one-Exchange plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from extractors_metadata_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, t, v) for i, s, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_gap_split_and_sequence(spark):
    # user 1: events at 0s, 10s, 1810s (gap 1800 exactly -> SAME session,
    # strict >), 3611s (gap 1801 -> new session). user 2: single event.
    df = _events(
        spark,
        [
            (0, 0, 1, "view", 1.0),
            (1, 10, 1, "click", 1.0),
            (2, 1810, 1, "view", 1.0),
            (3, 3611, 1, "view", 1.0),
            (4, 5, 2, "view", 1.0),
        ],
    )
    out = {
        r["event_id"]: (r["session_seq"], r["session_id"])
        for r in sessionize(df, gap_s=1800).collect()
    }
    assert out[0] == (1, "1-1")
    assert out[1] == (1, "1-1")
    assert out[2] == (1, "1-1")  # 1800s gap is NOT > 1800s
    assert out[3] == (2, "1-2")
    assert out[4] == (1, "2-1")


def test_equal_timestamp_tiebreak(spark):
    # two events share a timestamp; the id order decides which is "previous".
    # With gap_s=0 every positive gap splits; the equal-ts pair stays joined
    # only if the gap is 0 (not > 0) — both land in one session regardless of
    # partition layout because ordering is (ts, id).
    df = _events(spark, [(5, 0, 1, "a", 0.0), (3, 0, 1, "b", 0.0), (9, 1, 1, "c", 0.0)])
    out = {r["event_id"]: r["session_seq"] for r in sessionize(df, gap_s=0).collect()}
    assert out[3] == 1 and out[5] == 1  # 0us gap, not > 0
    assert out[9] == 2  # 1s gap > 0


def test_session_stats_exact(spark):
    df = _events(
        spark,
        [
            (0, 0, 1, "view", 0.1),
            (1, 60, 1, "click", 0.2),
            (2, 7200, 1, "view", 5.0),
        ],
    )
    rows = {r["session_id"]: r for r in session_stats(df, gap_s=1800).collect()}
    s1, s2 = rows["1-1"], rows["1-2"]
    assert s1["n_events"] == 2 and s1["duration_us"] == 60_000_000
    assert s1["n_types"] == 2
    # 0.1 + 0.2 through decimal is exactly 0.3 (double addition is not)
    assert s1["sum_value"] == 0.3
    assert s2["n_events"] == 1 and s2["duration_us"] == 0 and s2["sum_value"] == 5.0


def test_session_stats_single_shuffle(spark):
    # the groupBy keys are a superset of the window's partition key, so the
    # window's Exchange satisfies the aggregate's ClusteredDistribution —
    # exactly ONE shuffle end-to-end.
    df = _events(spark, [(0, 0, 1, "view", 1.0)])
    plan = session_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_allen_census_hand_relations(spark):
    # one key, intervals engineered to hit all 7 forward relations once.
    from extractors_metadata_spark.operators.sessions import allen_census

    rows = [
        # (id, s, en) — canonical order by (s, en, id)
        (1, 0, 10),    # vs (2): equals; vs (3): starts; vs others below
        (2, 0, 10),    # equals with 1
        (3, 0, 20),    # starts (1->3, 2->3)
        (4, 5, 10),    # 1 overlaps? a=(0,10) b=(5,10): a.s<b.s, a.e==b.e -> finished_by
        (5, 10, 15),   # (1,2) meets 5 (e=10==s); 3 overlaps 5 (10<20<? 20>15 -> contains? a=(0,20) b=(10,15): a.e=20>b.e=15 -> contains)
        (6, 30, 40),   # before everything earlier
    ]
    df = spark.createDataFrame(rows, "event_id long, s long, en long")
    df = df.withColumn("user_id", F.lit(7).cast("long"))
    out = allen_census(df, key_col="user_id").collect()[0].asDict()
    # n = 6 -> 15 pairs
    assert out["n_pairs"] == 15
    assert out["n_equals"] == 1          # (1,2)
    assert out["n_starts"] == 2          # (1,3),(2,3)
    assert out["n_finished_by"] == 2     # (1,4),(2,4)
    assert out["n_meets"] == 3           # (1,5),(2,5),(4,5)
    assert out["n_contains"] == 2        # (3,4),(3,5)
    assert out["n_before"] == 5          # everything vs 6
    # column total == n_pairs (census is a partition)
    total = sum(
        out["n_" + r]
        for r in ("before", "meets", "overlaps", "finished_by",
                  "contains", "starts", "equals")
    )
    assert total == out["n_pairs"]

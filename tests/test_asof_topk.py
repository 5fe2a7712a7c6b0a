"""As-of join (operators/asof.py) + skew-safe top-k (skew.top_k_per_key).

Pins the determinism contracts the driver oracles rely on: inclusive
backward match with right-before-left tie order, tolerance nulling the match
but keeping the row, and salted-two-phase == plain-window exactness.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.asof import asof_join
from extractors_metadata_spark.operators.skew import domain_cap, top_k_per_key


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows, extra="value double"):
    return spark.createDataFrame(
        rows, f"event_id long, user_id long, ts timestamp, {extra}"
    )


def test_asof_basic_backward_match(spark):
    left = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01 10:00:00"), 1.0),
            (11, 1, _ts("2024-01-01 12:00:00"), 2.0),
            (12, 2, _ts("2024-01-01 09:00:00"), 3.0),  # no right row for user 2
        ],
    )
    right = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01 09:30:00"), 7.0),
            (2, 1, _ts("2024-01-01 11:00:00"), 8.0),
        ],
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, on="user_id", left_id="event_id").collect()
    }
    assert out[10]["event_id_r"] == 1 and out[10]["asof_gap_us"] == 1800 * 1_000_000
    assert out[11]["event_id_r"] == 2 and out[11]["value_r"] == 8.0
    assert out[12]["event_id_r"] is None and out[12]["asof_gap_us"] is None
    assert len(out) == 3  # LEFT semantics: every left row survives


def test_asof_equal_ts_is_inclusive(spark):
    left = _events(spark, [(10, 1, _ts("2024-01-01 10:00:00"), 1.0)])
    right = _events(spark, [(1, 1, _ts("2024-01-01 10:00:00"), 7.0)])
    row = asof_join(left, right, on="user_id", left_id="event_id").collect()[0]
    assert row["event_id_r"] == 1 and row["asof_gap_us"] == 0


def test_asof_tolerance_nulls_stale_match(spark):
    left = _events(spark, [(10, 1, _ts("2024-01-02 10:00:00"), 1.0)])
    right = _events(spark, [(1, 1, _ts("2024-01-01 10:00:00"), 7.0)])
    keep = asof_join(left, right, on="user_id", left_id="event_id",
                     tolerance_s=86400).collect()[0]
    assert keep["event_id_r"] == 1  # exactly at the bound: kept
    drop = asof_join(left, right, on="user_id", left_id="event_id",
                     tolerance_s=86399).collect()[0]
    assert drop["event_id_r"] is None and drop["asof_gap_us"] is None


def test_asof_empty_right(spark):
    left = _events(spark, [(10, 1, _ts("2024-01-01 10:00:00"), 1.0)])
    right = _events(spark, []).limit(0)
    row = asof_join(left, right, on="user_id", left_id="event_id").collect()[0]
    assert row["event_id_r"] is None


def test_top_k_per_key_equals_plain_window(spark):
    # 3 keys with very different sizes (one "hot"), random-ish order values
    rows = [
        (i, f"k{i % 3 if i % 7 else 0}", (i * 2654435761) % 1000)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "rid long, key string, score long")
    got = top_k_per_key(df, ["key"], "score", "rid", k=7, n_salts=8)
    w = Window.partitionBy("key").orderBy("score", "rid")
    want = (
        df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 7)
    )
    a = sorted(map(tuple, got.select("rid", "key", "score", "rank").collect()))
    b = sorted(map(tuple, want.select("rid", "key", "score", "rank").collect()))
    assert a == b and len(a) == 21


def test_top_k_descending_and_small_groups(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 9), (3, "b", 1)], "rid long, key string, score long"
    )
    got = {
        (r["key"], r["rank"]): r["rid"]
        for r in top_k_per_key(
            df, ["key"], "score", "rid", k=2, ascending=False, n_salts=4
        ).collect()
    }
    # groups smaller than k come back whole; descending order by score
    assert got == {("a", 1): 2, ("a", 2): 1, ("b", 1): 3}


def test_domain_cap_quota_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(80)], "doc_id long, domain string"
    )
    out = domain_cap(df, key_col="domain", id_col="doc_id", k=3)
    pdf = out.toPandas()
    assert (pdf.groupby("domain").size() == 3).all()
    # pure function of the input: a second run keeps identical rows
    again = domain_cap(df, key_col="domain", id_col="doc_id", k=3).toPandas()
    assert sorted(pdf["doc_id"]) == sorted(again["doc_id"])

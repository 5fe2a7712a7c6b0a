"""Sparse shingle cosine (operators/sparse_sim.py) + rollup aggregates
(operators/rollup_stats.py)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.rollup_stats import rollup_stats
from extractors_metadata_spark.operators.sparse_sim import (
    shingle_cosine_pairs,
    shingle_tf,
)


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "a b c d e",
                    "a b c d x",  # shares shingles "a b c", "b c d" with 0
                    "p q r s t",
                ],
            }
        )
    )


def test_shingle_tf_counts_multiset(spark):
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["x y x y x y"]})
    )
    tfs = {r.shingle: r.tf for r in shingle_tf(d).collect()}
    # shingles: "x y x","y x y","x y x","y x y" -> 2 each
    assert tfs == {"x y x": 2, "y x y": 2}


def test_cosine_exact_closed_form(spark):
    out = {
        (r.id_a, r.id_b): r
        for r in shingle_cosine_pairs(
            _docs(spark), max_df=None, min_sim_fp=0
        ).collect()
    }
    r = out[(0, 1)]
    # doc0 shingles {abc, bcd, cde}, doc1 {abc, bcd, cdx}; tf all 1
    assert (r.dot, r.na2, r.nb2) == (2, 3, 3)
    want = int(round(2 / math.sqrt(3.0 * 3.0) * 1e9))
    assert r.sim_fp == want
    assert (0, 2) not in out and (1, 2) not in out


def test_band_defines_space(spark):
    # with max_df=1, shared shingles (df=2) leave the space -> no pairs
    out = shingle_cosine_pairs(_docs(spark), max_df=1, min_sim_fp=0).collect()
    assert out == []


def test_threshold_filters(spark):
    out = shingle_cosine_pairs(
        _docs(spark), max_df=None, min_sim_fp=700_000_000
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == []  # 2/3 < 0.7
    out = shingle_cosine_pairs(
        _docs(spark), max_df=None, min_sim_fp=600_000_000
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]


def test_no_arrow_in_plan(spark):
    plan = (
        shingle_cosine_pairs(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _events(spark):
    import datetime as dt

    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                dt.datetime(2024, 1 + i % 2, 1 + i % 5),
                i % 7,
                "a" if i % 3 else "b",
                float(i) / 8.0,
            )
        )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    ).withColumn("month", F.to_date(F.date_trunc("month", F.col("ts").cast("timestamp"))))


def test_rollup_levels_and_totals(spark):
    e = _events(spark)
    out = rollup_stats(e, ["event_type", "month"]).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r.gid, []).append(r)
    # gid 0 = detail, 1 = per-type subtotal, 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1
    total = by_gid[3][0]
    assert total.n_events == 40
    assert total.n_events == sum(r.n_events for r in by_gid[0])
    assert total.value_sum_u == sum(r.value_sum_u for r in by_gid[0])
    for sub in by_gid[1]:
        details = [r for r in by_gid[0] if r.event_type == sub.event_type]
        assert sub.n_events == sum(r.n_events for r in details)


def test_rollup_is_single_aggregate_plan(spark):
    e = _events(spark)
    plan = (
        rollup_stats(e, ["event_type", "month"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Expand feeding the aggregate — never N separate scans
    assert plan.count("Expand") >= 1
    assert plan.count("Scan") <= 2  # distinct-agg may rewrite, but no per-level scan fan-out

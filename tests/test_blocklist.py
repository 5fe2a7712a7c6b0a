from __future__ import annotations

import pytest

from extractors_metadata_spark.operators.blocklist import blocklist_hits


def _run(spark, rows, patterns):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["hits"], r["n_patterns"], r["keep"])
        for r in blocklist_hits(df, patterns).collect()
    }


def test_counts_and_verdict(spark):
    got = _run(
        spark,
        [
            (1, "a slow query and another slow query here"),
            (2, "big table big table big table"),
            (3, "nothing banned at all"),
            (4, "slow query meets big table"),
            (5, ""),
        ],
        ["slow query", "big table"],
    )
    assert got[1] == (2, 1, False)
    assert got[2] == (3, 1, False)
    assert got[3] == (0, 0, True)
    assert got[4] == (2, 2, False)
    assert got[5] == (0, 0, True)


def test_nonoverlapping_leftmost(spark):
    # replace() counts leftmost non-overlapping: "aaa" contains one "aa"
    got = _run(spark, [(1, "aaa"), (2, "aaaa")], ["aa"])
    assert got[1][0] == 1
    assert got[2][0] == 2


def test_empty_patterns_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty pattern"):
        blocklist_hits(df, [])


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = blocklist_hits(df, ["slow query", "big table"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

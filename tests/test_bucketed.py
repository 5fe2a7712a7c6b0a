"""Bucketed tables (sources/bucketed.py): the Exchange really disappears.

These are plan-shape tests — the point of bucketing is WHERE the shuffle
happens (once, at write), so the assertion is on the physical plan, with a
value check that co-located results equal the plain shuffled join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extractors_metadata_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va")
    )
    b = spark.range(0, 1000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("vb")
    )
    write_bucketed(a, "t_bucket_a", ("k",), 8, sort_cols=("k",))
    write_bucketed(b, "t_bucket_b", ("k",), 8, sort_cols=("k",))
    yield a, b
    drop_bucketed(spark, "t_bucket_a")
    drop_bucketed(spark, "t_bucket_b")


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    ta = read_bucketed(spark, "t_bucket_a")
    tb = read_bucketed(spark, "t_bucket_b")
    joined = ta.hint("merge").join(tb, "k").select("k", "va", "vb")
    plan = _executed_plan(joined)
    assert "Exchange" not in plan
    # and the values equal the plain shuffled join
    want = sorted(map(tuple, a.join(b, "k").select("k", "va", "vb").collect()))
    got = sorted(map(tuple, joined.collect()))
    assert got == want and len(got) == 500


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    ta = read_bucketed(spark, "t_bucket_a")
    agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan
    assert agg.count() == 1000


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # negative control: the same join without bucketed tables shuffles
    a, b = bucketed_pair
    plan = _executed_plan(a.hint("merge").join(b, "k").select("k", "va", "vb"))
    assert "Exchange" in plan

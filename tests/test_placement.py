"""Pins for placement arithmetic: the apportionment sum invariant and
largest-remainder tie handling; HRW balance and the minimal-movement
guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_apportion_sums_to_budget_exactly(spark):
    """3 sources with token shares that do NOT divide the budget: floor
    quotas undershoot and the largest remainders take the difference —
    hand-checkable on 7/2/1 tokens at budget 10: shares 7.0/2.0/1.0
    divide exactly; at budget 11: 7.7/2.2/1.1 -> base 7/2/1, leftover 1
    goes to the largest remainder (source a, rem .7)."""
    from extractors_metadata_spark.operators.placement import token_apportion

    rows = [
        (0, "w " * 7, "a"),
        (1, "w " * 2, "b"),
        (2, "w", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["source"]: r.asDict()
        for r in token_apportion(df, budget=11).collect()
    }
    assert sum(r["quota"] for r in out.values()) == 11
    assert (out["a"]["base"], out["a"]["quota"]) == (7, 8)
    assert (out["b"]["base"], out["b"]["quota"]) == (2, 2)
    assert (out["c"]["base"], out["c"]["quota"]) == (1, 1)


def test_hrw_balance_and_minimal_movement(spark):
    """2000 keys on 8 shards: every shard nonempty; adding shard 8 moves
    ONLY keys whose new shard is 8 (the rendezvous property: existing
    shards' relative order is untouched), and roughly 1/9 of keys."""
    from extractors_metadata_spark.operators.placement import hrw_shards

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = hrw_shards(df, n_shards=8).collect()
    shards8 = {r["shard8"] for r in out}
    assert shards8 == set(range(8))
    moved = [r for r in out if r["moved"]]
    assert all(r["shard9"] == 8 for r in moved)
    assert 0.05 < len(moved) / 2000 < 0.20  # ~1/9, frozen hash family

"""Bucketed parquet tables: co-located joins and aggregations, zero Exchange.

Scale rationale (100 TB): the engine's recurring joins — documents x URL
keys, signatures x signatures in incremental dedup, events x user dims —
shuffle both sides on every run. Hive-style bucketing pays that shuffle
ONCE at write time: rows are hash-partitioned into a fixed number of
buckets by the join key (Spark's ``bucketBy``), and every later equi-join
or aggregation on that key reads the buckets co-located — Catalyst plans a
SortMergeJoin / HashAggregate with NO Exchange on the bucketed side(s).
With ``sortBy`` the in-bucket sort is also prepaid, removing the Sort from
the join.

This is the right tool for the STABLE hub tables a pipeline joins against
every day (the dedup signature state, the URL-canonical survivor keys, the
user dim), complementing the snapshot layer (``sources/snapshot.py``),
which owns versioned/streaming state: snapshot tables optimize for commit/
time-travel/resume, bucketed tables for repeated join cost. Bucket counts
should be sized like shuffle partitions (~2-4x total cores, stable across
writes: both sides of a co-located join must agree on count and key).

Bucketing metadata lives in the session catalog (``saveAsTable``), backed
by parquet files under ``spark.sql.warehouse.dir`` — no Hive metastore
needed; on a cluster, point the warehouse at durable storage.

Reference analog: none (the reference joins row-at-a-time via REST lookups,
e.g. terra_mdcleaner's per-dataset metadata fetch); this is the engine-side
answer to making those lookups free at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (optionally in-bucket-sorted)
    parquet table in the session catalog. Re-writes with the same
    ``(bucket_cols, n_buckets)`` keep join co-location stable."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table; downstream joins/aggs on the bucket key plan
    without an Exchange on this side."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")

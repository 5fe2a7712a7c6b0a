"""Streaming per-tile rollup (streaming/tile_stream.py): end state equals
the one-shot batch tile counts; the batch-id guard blocks double counting."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.sources import snapshot as snap


def _pts(spark, n, lat0=33.07, lon0=-111.98):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": range(n),
                "lat": [lat0 + (i % 37) * 1e-4 for i in range(n)],
                "lon": [lon0 + (i % 23) * 1e-4 for i in range(n)],
            }
        )
    )


def _batch_counts(pts, zooms):
    from extractors_metadata_spark.operators.tile_assign import tile_assign

    boxes = pts.select(
        "event_id",
        F.col("lat").alias("min_lat"), F.col("lat").alias("max_lat"),
        F.col("lon").alias("min_lon"), F.col("lon").alias("max_lon"),
    )
    return (
        tile_assign(boxes, zooms=zooms, id_cols=("event_id",))
        .groupBy("z", "x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_stream_tiles_equal_batch_and_guard_blocks_replay(
    spark, tmp_path_factory
):
    from extractors_metadata_spark.streaming.tile_stream import (
        stream_tile_counts,
    )

    base = tmp_path_factory.mktemp("stile")
    input_dir, table = str(base / "in"), str(base / "t")

    pts = _pts(spark, 400)
    pts.repartition(6).write.parquet(input_dir)
    q = stream_tile_counts(
        spark, input_dir, table, str(base / "c"), schema=pts.schema,
        zooms=(11, 13), max_files_per_trigger=2,
    )
    q.awaitTermination(300)

    want = sorted(map(tuple, _batch_counts(pts, (11, 13)).collect()))
    got = sorted(
        map(tuple, snap.read_table(spark, table).select("z", "x", "y", "n").collect())
    )
    assert got == want

    # FRESH checkpoint replays every batch under the same stable ids: the
    # manifest guard must skip them all — state and snapshot count unchanged
    n_snaps = len(snap.live_snapshots(table))
    q2 = stream_tile_counts(
        spark, input_dir, table, str(base / "c2"), schema=pts.schema,
        zooms=(11, 13), max_files_per_trigger=2,
    )
    q2.awaitTermination(300)
    got2 = sorted(
        map(tuple, snap.read_table(spark, table).select("z", "x", "y", "n").collect())
    )
    assert got2 == want
    assert len(snap.live_snapshots(table)) == n_snaps


def test_tile_count_update_merges_exactly(spark):
    from extractors_metadata_spark.streaming.tile_stream import (
        tile_count_update,
    )

    a = spark.createDataFrame(
        [(12, 1, 2, 5), (12, 1, 3, 1)], "z int, x long, y long, n long"
    )
    b = spark.createDataFrame(
        [(12, 1, 2, 2), (12, 9, 9, 7)], "z int, x long, y long, n long"
    )
    got = sorted(map(tuple, tile_count_update(a, b).collect()))
    assert got == [(12, 1, 2, 7), (12, 1, 3, 1), (12, 9, 9, 7)]
    assert tile_count_update(None, b) is b

"""Continuous per-tile rollup over a point stream.

Engine-added capability: the streaming twin of the batch tile fan-out
(``operators/tile_assign.py``) — maintain live per-tile document counts as
micro-batches arrive, the materialized-view-maintenance shape behind every
"heatmap of the crawl, right now" surface. State is an ordinary snapshot
table of (z, x, y, n): time-travelable ("density as of snapshot N"),
bounded by the number of DISTINCT tiles touched (not by stream length),
and mergeable offline by the same group-sum.

Delivery semantics: counts ADD, so redelivered batches would double-count —
the manifest batch-id guard (same mechanism as
``sketch_stream.stream_cms_counts``, pinned there in pytest) applies each
foreachBatch id exactly once, turning at-least-once delivery into
effectively-once state.

Scale design: each batch pays one Arrow tile pass over ITS OWN rows plus a
groupBy whose output is bounded by the batch's distinct tiles; the merge
unions two narrow (z, x, y, n) tables and re-sums — state-table-sized, not
stream-sized. Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tile_assign import tile_assign
from ..sources.snapshot import read_table, write_snapshot
from .sketch_stream import _applied_batch_ids


def tile_count_update(
    stored: DataFrame | None, batch_tiles: DataFrame
) -> DataFrame:
    """Merge a batch's (z, x, y, n) delta into the stored rollup (union +
    re-sum; exact integers, so the merged state is order-independent)."""
    if stored is None:
        return batch_tiles
    return (
        stored.unionByName(batch_tiles)
        .groupBy("z", "x", "y")
        .agg(F.sum("n").alias("n"))
    )


def stream_tile_counts(
    spark: SparkSession,
    input_dir: str,
    state_table: str,
    checkpoint_dir: str,
    schema,
    zooms: tuple[int, ...] = (12,),
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_files_per_trigger: int = 4,
):
    """Maintain the per-tile count table for a parquet point stream.
    ``read_table(state_table)`` answers at any time (including as-of past
    snapshots); rows are (z, x, y, n)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _applied_batch_ids(state_table):
            return  # redelivered batch: counts add, so skip (guard rule)
        pts = batch_df.select(
            F.col(id_col),
            F.col(lat_col).alias("min_lat"), F.col(lat_col).alias("max_lat"),
            F.col(lon_col).alias("min_lon"), F.col(lon_col).alias("max_lon"),
        )
        delta = (
            tile_assign(pts, zooms=zooms, id_cols=(id_col,))
            .groupBy("z", "x", "y")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        merged = tile_count_update(read_table(spark, state_table), delta)
        write_snapshot(
            merged, state_table, "replace", metrics={"batch_id": batch_id}
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Adaptive quadtree histogram — density-adaptive spatial binning.

Engine-added geospatial capability: fixed-zoom tiles (tile_assign /
tile_pyramid) waste cells where data is sparse and saturate where it is
dense; the adaptive quadtree splits every cell whose count exceeds ``cap``
into its four z+1 children, recursively, down to ``z_max`` — the classic
adaptive spatial index / heatmap binning (region quadtree, Finkel &
Bentley 1974).  Output is the LEAF set: disjoint cells covering every
point, each with its exact count; leaves exceed ``cap`` only at ``z_max``.

Leaf rule (deterministic, local): a point's leaf is the COARSEST level
z in [z_min, z_max] whose enclosing cell holds <= cap points, else its
z_max cell.  All points sharing a z_max tile share their whole ancestor
chain, so they agree on the leaf — leaves partition the point set exactly.

Float discipline: the slippy trig runs ONCE at z_max (the frozen NumPy
kernel); every coarser cell is an exact integer shift of the base tile
(the tile_pyramid halving identity) — never per-level trig, whose ulp
drift amplifies with 2^z (the idw_surface lesson, CLAUDE.md).

Scale design (10^12 points):
- the point table is touched ONCE (the base z_max tile aggregate,
  map-side combining); everything after runs on the OCCUPIED-TILE frame
  (#distinct z_max tiles, orders of magnitude smaller);
- per-level counts re-aggregate the base frame by shifted coords (k tiny
  aggregates of the collapsed frame — never the points);
- the ancestor-chain explode (k = z_max - z_min + 1 rows per OCCUPIED
  tile, a bounded literal fan-out) joins the level-count dim once
  ((z, x, y)-keyed; the dim is occupied-tile sized and broadcastable);
- leaf choice is a min-when aggregate per base tile; the final leaf
  rollup sums the base counts — every aggregate exact int64 with
  map-side combine.

Reference analog: none — widens the reference's fixed plot grid
(`/root/reference/sensorposition/plotid_by_latlon.py:43-46`) the same way
tile_assign does, but density-adaptive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_udfs import tile_xy_udf


def quadtree_leaves(
    points: DataFrame,
    z_min: int,
    z_max: int,
    cap: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(z, x, y, n_points): the adaptive quadtree's leaf cells."""
    if not 0 <= z_min <= z_max:
        raise ValueError("need 0 <= z_min <= z_max")
    base = (
        points.withColumn("_t", tile_xy_udf(z_max)(lat_col, lon_col))
        .groupBy(F.col("_t.x").alias("x"), F.col("_t.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if z_min < z_max:
        base = base.persist()  # consumed by the level counts AND the chain
    # per-level counts from the collapsed base frame (exact shifts)
    levels = None
    for z in range(z_min, z_max + 1):
        d = z_max - z
        lv = base.groupBy(
            F.lit(z).alias("z"),
            F.shiftright("x", d).alias("xz"),
            F.shiftright("y", d).alias("yz"),
        ).agg(F.sum("n").alias("cnt"))
        levels = lv if levels is None else levels.unionByName(lv)
    # ancestor chain per occupied base tile -> join counts -> leaf level
    chain = base.select(
        "x",
        "y",
        "n",
        F.explode(
            F.array(*[F.lit(z) for z in range(z_min, z_max + 1)])
        ).alias("z"),
    ).select(
        "x",
        "y",
        "n",
        "z",
        # column-valued shift: x div 2^(z_max-z) — F.shiftright takes a
        # LITERAL bit count (CLAUDE.md), pow(2, k) is exact to 2^52
        F.expr(f"x div CAST(pow(2, {z_max} - z) AS BIGINT)").alias("xz"),
        F.expr(f"y div CAST(pow(2, {z_max} - z) AS BIGINT)").alias("yz"),
    )
    leaf = (
        chain.join(F.broadcast(levels), ["z", "xz", "yz"])
        .groupBy("x", "y", "n")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("cnt") <= cap, F.col("z"))),
                F.lit(z_max),
            ).alias("leaf_z")
        )
    )
    return (
        leaf.groupBy(
            F.col("leaf_z").alias("z"),
            F.expr(f"x div CAST(pow(2, {z_max} - leaf_z) AS BIGINT)").alias("x"),
            F.expr(f"y div CAST(pow(2, {z_max} - leaf_z) AS BIGINT)").alias("y"),
        )
        .agg(F.sum("n").alias("n_points"))
    )

"""Sort-Tile-Recursive (STR) R-tree bulk-load packing of a point set.

STR (Leutenegger, Lopez & Edgington, ICDE 1997) is the canonical way to
bulk-load a spatial index — and, at cluster scale, the standard recipe
for PARTITIONING a 100 TB point table into spatially-coherent leaves
(SpatialHadoop/Sedona both pack this way): sort by x into ceil(sqrt(L))
vertical slices of S*C points, sort each slice by y, cut into leaves of
C points. Output is the packed leaf table (leaf id, count, exact MBR) —
the frame a distributed spatial join range-prunes against.

Exactness: coordinates are quantize-once micro-degree ints; slice/leaf
arithmetic is pure integer (ceil-div; ceil-sqrt via exact isqrt with a
+1 adjustment — floor(sqrt(double)) in the oracle is exact for int64
inputs because IEEE sqrt is correctly rounded); ranks are over the
unique (x, y, id) total order, so every assignment replays bit-for-bit.

Scale shape: the global x-rank is the honest two-phase distributed
pattern — repartitionByRange + sortWithinPartitions, per-partition
counts broadcast as offsets, row_number within partitions (NEVER a
single-partition global window; boundaries are sampled but the rank
over a unique total order is boundary-independent). The per-slice
y-rank is a partitioned window whose key count is ceil(sqrt(L)) —
at 10^12 points that is ~1.25e5 slices of ~8e6 rows, a healthy
exchange. The leaf MBR aggregate is one hash agg on the leaf key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK_PARTS = 32


def _global_rank(pts: DataFrame, order_cols: list[str]) -> DataFrame:
    """Append ``rk``: the 1-based global rank under the (unique) total
    order of ``order_cols`` — two-phase: range-partition + local sort,
    broadcast per-partition offsets, local row_number + offset."""
    cols = [F.col(c) for c in order_cols]
    p = (
        pts.repartitionByRange(_RANK_PARTS, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = p.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
    )
    wloc = Window.partitionBy("_pid").orderBy(*cols)
    return (
        p.join(F.broadcast(offsets), "_pid")
        .withColumn("rk", F.row_number().over(wloc) + F.col("_off"))
        .drop("_pid", "_off")
    )


def str_pack(
    pts: DataFrame,
    cap: int = 64,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """STR-pack points into R-tree leaves -> (leaf_id, n_pts, min_x,
    min_y, max_x, max_y): L = ceil(n/cap) leaves in S = ceil(sqrt(L))
    x-slices of S*cap points, each slice y-sorted and cut every ``cap``
    points. leaf_id = slice * S + position (slices can under-fill; ids
    are unique, not necessarily dense)."""
    p = pts.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    n = p.count()
    if n == 0:
        return p.sparkSession.createDataFrame(
            [],
            "leaf_id long, n_pts long, min_x long, min_y long, "
            "max_x long, max_y long",
        )
    leaves = (n + cap - 1) // cap
    s0 = math.isqrt(leaves)
    s = s0 + (1 if s0 * s0 < leaves else 0)
    slice_cap = s * cap
    ranked = _global_rank(p, ["x", "y", "id"]).withColumn(
        "_slice", F.expr(f"(rk - 1) div {slice_cap}")
    )
    wy = Window.partitionBy("_slice").orderBy("y", "x", "id")
    leafed = ranked.withColumn("_rs", F.row_number().over(wy)).withColumn(
        "leaf_id",
        (F.col("_slice") * s + F.expr(f"(_rs - 1) div {cap}")).cast("long"),
    )
    return (
        leafed.groupBy("leaf_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            F.min("x").alias("min_x"),
            F.min("y").alias("min_y"),
            F.max("x").alias("max_x"),
            F.max("y").alias("max_y"),
        )
    )

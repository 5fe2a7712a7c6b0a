"""Integer DDA line rasterization: draw track segments onto the grid.

tile_assign covers POINTS; serving a GPS trace on a tile map needs the
SEGMENTS — every grid cell a track's straight legs pass through (the
raster leg of the north rule's raster<->vector pair). This is the
classical midpoint DDA (the Bresenham equivalent): walk the major axis
one cell per step, interpolate the minor axis with the frozen
round-half rule

    minor(s) = minor_1 + floor((2 . s . d_minor + D) / (2 . D)),
    D = max(|d_major|, |d_minor|) steps -> exactly D + 1 cells,
    8-connected, endpoints exact.

Exactness: cell coordinates derive from event_id via the mapmatch
half-milli-cell integer lattice; the interpolation is FLOOR division
by the positive 2D — floor (not truncation) is what makes the s = D
endpoint land EXACTLY on cell 2 for descending lines (trunc(dr + 1/2)
= dr + 1 when dr < 0). Measured this session: Spark `div` AND DuckDB
integer `//` BOTH truncate toward zero, so floor-div is built
explicitly in BOTH engines as (n - pmod(n, d)) div d (the adjusted
numerator is divisible — truncation becomes exact). No float exists
anywhere.

Scale shape: one user-keyed window for consecutive pairs (the only
exchange), then a codegen explode of at most max(grid) cells per
segment — fan-out bounded by the grid diameter, never by data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

T_LEN = 16


def _interp(minor1: str, dminor: str) -> str:
    """SQL expr: minor1 + floor-div(2*s*dminor + dd, 2*dd), dd > 0,
    floor built from truncating div via the pmod adjustment."""
    n = f"(2 * s * {dminor} + dd)"
    return f"{minor1} + ({n} - pmod({n}, 2 * dd)) div (2 * dd)"


def line_raster(
    events: DataFrame,
    t_len: int = T_LEN,
    max_users: int = 40,
) -> DataFrame:
    """-> (user_id, t, s, r, c): for each consecutive observation pair
    (t, t+1) of each user's first ``t_len`` points, the s-th cell of
    the midpoint-DDA walk from cell(t) to cell(t+1). Every segment
    emits exactly max(|dr|, |dc|) + 1 cells (one when the endpoints
    share a cell)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.filter(F.col("user_id") < max_users)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.expr("((event_id % 1000) * 108 + 54) div 2000").alias("r"),
            F.expr("((event_id % 640) * 50 + 25) div 2000").alias("c"),
        )
        .withColumn("_s", F.row_number().over(w))
        .filter(F.col("_s") <= t_len)
    )
    segs = seq.select(
        "user_id",
        (F.col("_s") - 1).alias("t"),
        F.col("r").alias("r1"),
        F.col("c").alias("c1"),
        F.lead("r").over(w).alias("r2"),
        F.lead("c").over(w).alias("c2"),
    ).filter(F.col("r2").isNotNull())
    stepped = segs.select(
        "user_id",
        "t",
        "r1",
        "c1",
        (F.col("r2") - F.col("r1")).alias("dr"),
        (F.col("c2") - F.col("c1")).alias("dc"),
        F.greatest(
            F.abs(F.col("r2") - F.col("r1")),
            F.abs(F.col("c2") - F.col("c1")),
        ).alias("dd"),
    ).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.col("dd"))).alias("s"),
    )
    return stepped.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("t").cast("long").alias("t"),
        F.col("s").cast("long").alias("s"),
        F.expr(
            f"CASE WHEN dd = 0 THEN r1 ELSE {_interp('r1', 'dr')} END"
        ).cast("long").alias("r"),
        F.expr(
            f"CASE WHEN dd = 0 THEN c1 ELSE {_interp('c1', 'dc')} END"
        ).cast("long").alias("c"),
    )

"""Tile pyramid rollup — multi-resolution aggregation from the finest level.

The map-serving shape of the engine's tile assignment (J7): a tile server
needs per-tile aggregates at EVERY zoom in a band (z_min..z_max).  The naive
plan re-aggregates the raw point table once per zoom — (z_max - z_min + 1)
full scans + shuffles of the 10^12-row table.  The pyramid plan aggregates
the raw table ONCE at z_max, then derives each coarser level from the
previous LEVEL'S AGGREGATE: a z-1 tile is exactly the sum of its four z
children (slippy parent = (x >> 1, y >> 1)), so

    agg[z-1] = agg[z].groupBy(x >> 1, y >> 1).sum(...)

Scale design:
- raw data is touched exactly once (the z_max aggregate); every further
  Exchange moves the per-TILE frame, which shrinks ~4x per level, so the
  whole cascade costs <= 4/3 of the base aggregate's shuffle volume vs
  (z_max - z_min + 1) full-table shuffles for the naive plan;
- parent derivation is pure integer shiftright in whole-stage codegen;
- every level is persisted while it feeds BOTH the next level and the
  union'd result (2 consumers), and released by the caller via the
  returned cache list (the ``_cache_scoped`` registry pattern);
- all aggregates are exact int64 (counts + per-point half-even fixed-point
  values), so rollup-from-children is BIT-equal to direct aggregation at
  each z — which is precisely what the DuckDB oracle checks (it computes
  every level straight from raw lat/lon with the literal slippy formula;
  equality proves the halving identity floor(t * 2^(z-1)) ==
  floor(t * 2^z) >> 1 end-to-end through the engine).

Exactness note: parent = child >> 1 is exact in IEEE terms because the
slippy formulas are ``floor(g * 2^z)`` with g computed independently of z —
multiplying a double by a power of two only shifts the exponent, so
floor(g * 2^(z-1)) == floor(g * 2^z) >> 1 with no rounding hazard (x's
mod-2^z wrap commutes with the shift; y's pole clamp commutes because
clamp(v, 0, 2^z - 1) >> 1 == clamp(v >> 1, 0, 2^(z-1) - 1) for v >= 0).

Reference analog: none — the reference's discrete bucketing is single-level
(``/root/reference/sensorposition/plotid_by_latlon.py:43-46``); this is the
engine-added multi-resolution serving path (BASELINE.json north_star
raster tiles), the "hypertable rollup" shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_pyramid(
    tiles: DataFrame,
    z_max: int,
    z_min: int,
    value_fp_col: str | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """Per-tile (n_points, sum_fp) at every zoom in [z_min, z_max].

    ``tiles``: one row per point, already assigned at ``z_max`` — columns
    (x, y[, value_fp_col]) with ``value_fp_col`` an exact int64 fixed-point
    value (callers round doubles with half-even BEFORE the sum so every
    aggregate in the pyramid is order-independent integer arithmetic).

    Returns (result, caches): result has (z, x, y, n_points, sum_fp) for
    every level; ``caches`` are the persisted per-level frames — callers
    unpersist them after the consuming action.
    """
    if not 0 <= z_min <= z_max:
        raise ValueError("need 0 <= z_min <= z_max")
    v = (
        F.sum(F.col(value_fp_col)).alias("sum_fp")
        if value_fp_col
        else F.lit(0).cast("long").alias("sum_fp")
    )
    level = tiles.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("n_points"), v
    )
    caches: list[DataFrame] = []
    levels: list[DataFrame] = []
    for z in range(z_max, z_min - 1, -1):
        if z > z_min:  # feeds next level AND the union -> 2 consumers
            level = level.persist()
            caches.append(level)
        levels.append(level.select(F.lit(z).alias("z"), "x", "y", "n_points", "sum_fp"))
        if z > z_min:
            level = level.groupBy(
                F.shiftright("x", 1).alias("x"), F.shiftright("y", 1).alias("y")
            ).agg(
                F.sum("n_points").alias("n_points"),
                F.sum("sum_fp").alias("sum_fp"),
            )
    out = levels[0]
    for lf in levels[1:]:
        out = out.unionByName(lf)
    return out, caches

"""Spatial autocorrelation: local Moran statistics over a cell grid.

A-family widening: the reference aggregates per-plot observations but
never asks the follow-up every field scientist asks — "are high values
CLUSTERED in space?" (hot fields, crawl hotspots, regional quality
drift).  The standard answer is Moran's I; its local form (Anselin LISA)
is per-cell: x_i times the spatial lag sum(w_ij * x_j) over neighbors.

Engine semantics (exact, cross-engine replayable):
- input is a CELL frame: integer cell coords ``(cx, cy)`` + an exact
  integer cell value ``x`` (quantize-once rule: the caller sums
  fixed-point values per cell, so every downstream number is int64);
- weights are queen adjacency (the 8 surrounding cells, w = 1) — the
  classical contiguity matrix, realized as an 8-offset EXPLODE on the
  narrow (cx, cy, x) frame followed by one cell-keyed equi-join (never
  a distance self-join: adjacency is an exact key match);
- output is one row per cell: ``x``, neighbor count ``w_deg`` and the
  exact integer spatial lag ``lag = sum(x_j over neighbors)``.  Global
  Moran's I is a consumer-side ratio of sums over these columns
  (N, W = sum(w_deg), sum(x), sum(x^2), sum(x*lag) — all derivable),
  and per-cell LISA is x_i-centered arithmetic on the same row.

Scale design: the exploded side is 8x a three-int-column frame and the
join is a shuffle equi-join on the cell key — both linear in cells, no
distance math, no fan-out beyond the fixed 8.  int64 budget: products
downstream of this operator multiply two cell sums, so callers keep
per-cell sums below ~3e9 (quantization scale contract, the ``ols_slope``
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUEEN = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          if not (dx == 0 and dy == 0)]


def local_moran(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    x_col: str = "x",
) -> DataFrame:
    """(cx, cy, x, w_deg, lag) — queen-adjacency spatial lag per cell.

    ``w_deg`` counts neighbors that EXIST in the frame (edge cells have
    fewer than 8); cells with no neighbors get w_deg = 0, lag = 0.
    """
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _QUEEN
    ])
    shifted = (
        cells.select(cx_col, cy_col, x_col)
        .withColumn("_o", F.explode(offs))
        .select(
            (F.col(cx_col) + F.col("_o.dx")).alias(cx_col),
            (F.col(cy_col) + F.col("_o.dy")).alias(cy_col),
            F.col(x_col).alias("_xn"),
        )
    )
    lag = shifted.groupBy(cx_col, cy_col).agg(
        F.count(F.lit(1)).alias("_w_deg"),
        F.sum("_xn").alias("_lag"),
    )
    # the lag frame also contains phantom cells (neighbors of real cells
    # that hold no points) — the inner side of the join drops them
    return (
        cells.join(lag, [cx_col, cy_col], "left")
        .select(
            F.col(cx_col),
            F.col(cy_col),
            F.col(x_col).cast("long").alias(x_col),
            F.coalesce(F.col("_w_deg"), F.lit(0)).cast("long").alias("w_deg"),
            F.coalesce(F.col("_lag"), F.lit(0)).cast("long").alias("lag"),
        )
    )

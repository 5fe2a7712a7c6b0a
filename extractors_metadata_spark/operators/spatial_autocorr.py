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


def occupancy_flags(
    events: DataFrame, n_rows: int = 54, n_cols: int = 16
) -> tuple[DataFrame, DataFrame]:
    """(lattice, flags): the zero-filled plot-grid lattice and the
    binary above-average-occupancy surface — black iff n_cells * cnt >=
    total (cross-multiplied integer predicate, scale-free). Cells come
    from event_id by the mapmatch half-milli-cell integer arithmetic.
    Shared by join_counts and marching_squares."""
    n_cells = n_rows * n_cols
    spark = events.sparkSession
    cnts = (
        events.select(
            F.expr("((event_id % 1000) * 108 + 54) div 2000").alias("r"),
            F.expr("((event_id % 640) * 50 + 25) div 2000").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = events.agg(F.count(F.lit(1)).cast("long").alias("n"))
    lat = (
        spark.range(n_rows)
        .select(F.col("id").alias("r"))
        .crossJoin(spark.range(n_cols).select(F.col("id").alias("c")))
    )
    flags = (
        lat.join(cnts, ["r", "c"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "c",
            F.when(
                F.lit(n_cells) * F.coalesce(F.col("cnt"), F.lit(0))
                >= F.col("n"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("b"),
        )
    )
    return lat, flags


# marching-squares segment counts per 4-bit corner case (corners SW=1,
# SE=2, NE=4, NW=8): 0 and 15 emit nothing, the two saddles (5, 10)
# emit two segments, every other case one.
_MS_SEGMENTS = (0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0)


def marching_squares(
    events: DataFrame,
    n_rows: int = 54,
    n_cols: int = 16,
) -> DataFrame:
    """Marching squares over the binary occupancy surface -> one row per
    2x2 cell block with a contour crossing: (r, c, case_idx,
    n_segments) — the classical raster->vector contouring step (the
    north rule's raster<->vector pair, vector direction): case_idx =
    SW + 2*SE + 4*NE + 8*NW over the block's corner flags, n_segments
    from the frozen 16-entry table (saddles 5/10 emit two — the
    ambiguity is REPORTED, not resolved: resolution needs subcell data
    this surface doesn't carry).

    Plan: the shared occupancy surface (one data-sized count agg), then
    four broadcast flag joins onto the (n_rows-1) x (n_cols-1) block
    lattice — O(lattice) after the first agg, no float anywhere."""
    lat, flags = occupancy_flags(events, n_rows, n_cols)
    blocks = lat.filter(
        (F.col("r") < n_rows - 1) & (F.col("c") < n_cols - 1)
    )
    j = blocks
    for name, dr, dc in (
        ("sw", 0, 0), ("se", 0, 1), ("ne", 1, 1), ("nw", 1, 0),
    ):
        f = flags.select(
            (F.col("r") - dr).alias("r"),
            (F.col("c") - dc).alias("c"),
            F.col("b").alias(name),
        )
        j = j.join(F.broadcast(f), ["r", "c"])
    case = (
        F.col("sw") + 2 * F.col("se") + 4 * F.col("ne") + 8 * F.col("nw")
    )
    seg_table = F.array(*[F.lit(s) for s in _MS_SEGMENTS])
    return (
        j.select(
            F.col("r").cast("long").alias("r"),
            F.col("c").cast("long").alias("c"),
            case.cast("long").alias("case_idx"),
            F.element_at(seg_table, case.cast("int") + 1)
            .cast("long")
            .alias("n_segments"),
        )
        .filter((F.col("case_idx") != 0) & (F.col("case_idx") != 15))
    )


def join_counts(
    events: DataFrame,
    n_rows: int = 54,
    n_cols: int = 16,
) -> DataFrame:
    """Join-count statistics (Cliff & Ord 1981) — the BINARY complement
    of local_moran: classify every plot-grid cell black/white by
    above-average event occupancy, count BB / WW / BW rook adjacencies,
    and emit the nonfree-sampling (hypergeometric) expectations as
    exact rationals over the common denominator n(n-1).  BW far below
    its expectation = black cells clump (the crawl-hotspot /
    field-disease spatial test at its simplest).

    Exactness: cells come from event_id by the mapmatch half-milli-cell
    integer arithmetic; "black" is the cross-multiplied integer
    predicate n_cells * cnt >= total (above-average occupancy — scale
    free, so the surface stays mixed at any SF); the lattice, its rook
    edge set (n_rows*(n_cols-1) + (n_rows-1)*n_cols edges), and every
    expectation numerator are int64.  No float exists anywhere.

    Plan: one cell-keyed count agg over the data; the 864-cell lattice
    and its edge set are generated frames (spark.range, no data scan);
    flags broadcast onto the edges (two dim-joins inside codegen); one
    1-row final agg.  Scale shape: the only data-sized exchange is the
    first count; everything after is O(lattice)."""
    n_cells = n_rows * n_cols
    n_edges = n_rows * (n_cols - 1) + (n_rows - 1) * n_cols
    lat, flags = occupancy_flags(events, n_rows, n_cols)
    edges = (
        lat.filter(F.col("r") < n_rows - 1)
        .select("r", "c", (F.col("r") + 1).alias("r2"), F.col("c").alias("c2"))
        .unionByName(
            lat.filter(F.col("c") < n_cols - 1).select(
                "r", "c", F.col("r").alias("r2"), (F.col("c") + 1).alias("c2")
            )
        )
    )
    je = (
        edges.join(
            F.broadcast(flags.select("r", "c", F.col("b").alias("b1"))),
            ["r", "c"],
        )
        .join(
            F.broadcast(
                flags.select(
                    F.col("r").alias("r2"),
                    F.col("c").alias("c2"),
                    F.col("b").alias("b2"),
                )
            ),
            ["r2", "c2"],
        )
        .agg(
            F.sum(F.col("b1") * F.col("b2")).alias("bb"),
            F.sum((1 - F.col("b1")) * (1 - F.col("b2"))).alias("ww"),
            F.sum(
                F.col("b1") + F.col("b2") - 2 * F.col("b1") * F.col("b2")
            ).alias("bw"),
        )
    )
    nb = flags.agg(F.sum("b").alias("n_black"))
    j, n = F.lit(n_edges).cast("long"), F.lit(n_cells).cast("long")
    black = F.col("n_black").cast("long")
    white = (n - black)
    return (
        je.crossJoin(F.broadcast(nb))
        .select(
            n.alias("n_cells"),
            j.alias("n_edges"),
            black.alias("n_black"),
            F.col("bb").cast("long").alias("bb"),
            F.col("ww").cast("long").alias("ww"),
            F.col("bw").cast("long").alias("bw"),
            (j * black * (black - 1)).alias("e_bb_num"),
            (j * white * (white - 1)).alias("e_ww_num"),
            (F.lit(2).cast("long") * j * black * white).alias("e_bw_num"),
            (n * (n - 1)).alias("e_den"),
        )
    )


def geary_c(
    events: DataFrame,
    n_rows: int = 54,
    n_cols: int = 16,
) -> DataFrame:
    """Geary's C over the plot-grid occupancy COUNT surface — the third
    canonical spatial-autocorrelation statistic beside Moran's I
    (local_moran) and the binary join counts: contiguity-weighted
    squared DIFFERENCES, sensitive to local structure where Moran reads
    global covariance.

        C = (n-1) . sum_edges (x_i - x_j)^2
            / (2W . sum_i (x_i - xbar)^2),   W = rook edge count

    emitted as the EXACT integer rational over the common n-scaled
    denominator: c_num = n(n-1) . sum_edges dx^2 and c_den = 2W .
    (n . sum x^2 - (sum x)^2) (multiply numerator and denominator by n
    to clear xbar — the chi_square rule). C < 1 = positive
    autocorrelation. int64 envelope: cell counts below ~2e4 keep
    n^2-scaled sums under 2^63 at this lattice.

    Plan: one cell count agg (the only data-sized exchange), zero-filled
    lattice, the generated rook edge frame with two broadcast value
    joins, three 1-row aggregates."""
    n_cells = n_rows * n_cols
    n_edges = n_rows * (n_cols - 1) + (n_rows - 1) * n_cols
    spark = events.sparkSession
    cnts = (
        events.select(
            F.expr("((event_id % 1000) * 108 + 54) div 2000").alias("r"),
            F.expr("((event_id % 640) * 50 + 25) div 2000").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lat = (
        spark.range(n_rows)
        .select(F.col("id").alias("r"))
        .crossJoin(spark.range(n_cols).select(F.col("id").alias("c")))
    )
    vals = lat.join(cnts, ["r", "c"], "left").select(
        "r", "c", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("x")
    )
    moments = vals.agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    edges = (
        lat.filter(F.col("r") < n_rows - 1)
        .select("r", "c", (F.col("r") + 1).alias("r2"), F.col("c").alias("c2"))
        .unionByName(
            lat.filter(F.col("c") < n_cols - 1).select(
                "r", "c", F.col("r").alias("r2"), (F.col("c") + 1).alias("c2")
            )
        )
    )
    ssd = (
        edges.join(
            F.broadcast(vals.select("r", "c", F.col("x").alias("x1"))),
            ["r", "c"],
        )
        .join(
            F.broadcast(
                vals.select(
                    F.col("r").alias("r2"),
                    F.col("c").alias("c2"),
                    F.col("x").alias("x2"),
                )
            ),
            ["r2", "c2"],
        )
        .agg(
            F.sum(
                (F.col("x1") - F.col("x2")) * (F.col("x1") - F.col("x2"))
            ).alias("sum_dx2")
        )
    )
    n, w = F.lit(n_cells).cast("long"), F.lit(n_edges).cast("long")
    return ssd.crossJoin(F.broadcast(moments)).select(
        n.alias("n_cells"),
        w.alias("n_edges"),
        F.col("sum_dx2").cast("long").alias("sum_dx2"),
        F.col("sx").cast("long").alias("sum_x"),
        F.col("sxx").cast("long").alias("sum_x2"),
        (n * (n - 1) * F.col("sum_dx2")).cast("long").alias("c_num"),
        (
            F.lit(2).cast("long")
            * w
            * (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).cast("long").alias("c_den"),
    )

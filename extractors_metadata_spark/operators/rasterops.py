"""Raster morphology + run-length encoding over the sparse tile surface.

Three map-algebra primitives the GIS/raster toolboxes ship beside region
labeling (blobs.tile_blobs) and smoothing (heatmap.tile_smooth):

- ``morph_close``: binary CLOSING (3x3 dilation then 3x3 erosion) of the
  occupancy raster — bridges 1-cell gaps and fills 1-cell holes, the
  standard de-speckling step before blob extraction.
- ``erosion_depth``: the bounded Chebyshev DISTANCE TRANSFORM of the
  occupied set — per occupied cell the distance to the nearest empty
  cell (equivalently: how many 3x3 erosions survive it), capped at
  ``max_r``.  The "core vs fringe" classifier of a raster mask.
- ``rle_runs``: per-row run-length encoding of the occupancy — the
  vector/compression view of the raster (scanline runs are how masks
  ship to renderers and how quadtree/interval indexes ingest them).

Reference analog: none (the reference renders full-field stitched
GeoTIFF masks; these are the raster post-processing ops such masks feed
into).  All three are exact int64 end to end — occupancy is counting,
morphology is set algebra on integer cells, so the DuckDB oracles
replay them verbatim.

Scale shapes (all the tile_smooth / slope_aspect scatter family —
shuffles linear in OCCUPIED cells, never in raster area):

- morph_close: one x9 literal scatter + distinct (dilation), one x9
  scatter of the dilated frame + grid-keyed count (erosion), one left
  join back to the occupancy for the fill flag.  x wraps mod 2^z, y
  out-of-range contributions drop (pole rows never erode — documented).
- erosion_depth: ONE scatter by the full (2R+1)^2-1 ring-tagged offset
  disk (R=3 -> 48 offsets) + grid equi-join + per-cell conditional
  ring-count aggregate; depth = first incomplete ring (a ring with an
  out-of-range y is incomplete by construction on both engines, since
  the missing cell simply contributes no row).
- rle_runs: one row-keyed window (lag + running sum of run starts) +
  one (row, run)-keyed aggregate — the skyline/interval_union
  prefix-frame idiom; no self-join.  The x = 0/2^z wrap seam splits a
  run (documented; field-local data never sees the antimeridian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cells(tile_counts: DataFrame, cnt_col: str) -> DataFrame:
    return tile_counts.select(
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
        F.col(cnt_col).cast("long").alias("cnt"),
    )


def offset_disk(lo: int, hi: int) -> list[tuple[int, int, int]]:
    """Chebyshev offset disk [(dx, dy, ring)] with lo <= ring <= hi —
    the single source both the Spark literal array AND the DuckDB
    oracle's VALUES table are generated from."""
    return [
        (dx, dy, max(abs(dx), abs(dy)))
        for dx in range(-hi, hi + 1)
        for dy in range(-hi, hi + 1)
        if lo <= max(abs(dx), abs(dy)) <= hi
    ]


def _offsets(lo: int, hi: int) -> F.Column:
    """Literal offset array [(dx, dy, r)] with r = Chebyshev ring."""
    return F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(r).alias("r")
            )
            for dx, dy, r in offset_disk(lo, hi)
        ]
    )


def morph_close(tile_counts: DataFrame, z: int, cnt_col: str = "cnt") -> DataFrame:
    """3x3 binary closing of the occupancy raster at zoom ``z`` ->
    (z, x, y, occupied, cnt): every cell of close(O) = erode(dilate(O)),
    with ``occupied`` = 1 for original cells (closing always contains
    the input) and 0 for gap cells the closing filled; ``cnt`` carries
    the original mass (0 on filled cells).

    Erosion demands ALL 9 neighbors (self included) dilated-occupied;
    a neighbor past the y range is absent, so pole rows never erode —
    the same rule both engines evaluate by construction.
    """
    n = 1 << z
    cells = _cells(tile_counts, cnt_col)
    box = _offsets(0, 1)  # 9 offsets incl self

    dil = (
        cells.select(F.explode(box).alias("o"), "x", "y")
        .select(
            ((F.col("x") + F.col("o.dx") + n) % n).alias("x"),
            (F.col("y") + F.col("o.dy")).alias("y"),
        )
        .filter((F.col("y") >= 0) & (F.col("y") < n))
        .distinct()
    )
    support = (
        dil.select(F.explode(box).alias("o"), "x", "y")
        .select(
            ((F.col("x") + F.col("o.dx") + n) % n).alias("x"),
            (F.col("y") + F.col("o.dy")).alias("y"),
        )
        .filter((F.col("y") >= 0) & (F.col("y") < n))
        .join(dil, ["x", "y"])  # erosion support must itself be dilated
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("_sup"))
    )
    closed = support.filter(F.col("_sup") == 9).select("x", "y")
    return closed.join(cells, ["x", "y"], "left").select(
        F.lit(z).cast("int").alias("z"),
        "x",
        "y",
        F.when(F.col("cnt").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("occupied"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
    )


def erosion_depth(
    tile_counts: DataFrame, z: int, max_r: int = 3, cnt_col: str = "cnt"
) -> DataFrame:
    """Bounded Chebyshev distance transform -> (z, x, y, cnt, depth):
    depth = the smallest ring r in 1..max_r whose 8r cells are not all
    occupied (the distance to the nearest empty cell), or max_r + 1 if
    every ring through max_r is complete.  depth is also the number of
    3x3 erosions the cell survives, capped."""
    n = 1 << z
    cells = _cells(tile_counts, cnt_col)
    disk = _offsets(1, max_r)
    nb = cells.select(F.col("x").alias("_nx"), F.col("y").alias("_ny"))

    ring_counts = (
        cells.select("x", "y", F.explode(disk).alias("o"))
        .select(
            "x", "y", F.col("o.r").alias("r"),
            ((F.col("x") + F.col("o.dx") + n) % n).alias("_nx"),
            (F.col("y") + F.col("o.dy")).alias("_ny"),
        )
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .join(nb, ["_nx", "_ny"])
        .groupBy("x", "y")
        .agg(
            *[
                F.sum(F.when(F.col("r") == r, 1).otherwise(0)).alias(f"_r{r}")
                for r in range(1, max_r + 1)
            ]
        )
    )
    j = cells.join(ring_counts, ["x", "y"], "left")
    depth = F.lit(max_r + 1)
    for r in range(max_r, 0, -1):
        depth = F.when(
            F.coalesce(F.col(f"_r{r}"), F.lit(0)) < 8 * r, F.lit(r)
        ).otherwise(depth)
    return j.select(
        F.lit(z).cast("int").alias("z"), "x", "y", "cnt",
        depth.cast("long").alias("depth"),
    )


def rle_runs(tile_counts: DataFrame, z: int, cnt_col: str = "cnt") -> DataFrame:
    """Per-row run-length encoding of the occupied cells at zoom ``z``
    -> (z, y, x_start, run_len, mass): maximal runs of x-consecutive
    occupied cells per raster row, with the total event mass per run."""
    cells = _cells(tile_counts, cnt_col)
    w = Window.partitionBy("y").orderBy("x")
    runs = cells.withColumn(
        "_new",
        F.when(F.col("x") - F.lag("x").over(w) == 1, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "_run",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy("y", "_run")
        .agg(
            F.min("x").alias("x_start"),
            F.count(F.lit(1)).alias("run_len"),
            F.sum("cnt").alias("mass"),
        )
        .select(
            F.lit(z).cast("int").alias("z"),
            "y", "x_start", "run_len", "mass",
        )
    )


def voronoi_alloc(
    tile_counts: DataFrame, z: int, n_seeds: int = 12, cnt_col: str = "cnt"
) -> DataFrame:
    """Discrete Voronoi allocation of the occupancy raster -> (z, x, y,
    cnt, seed_x, seed_y, d2): every occupied cell labeled with its
    nearest SEED — the ``n_seeds`` densest cells (count desc, then
    (x, y) asc — frozen) — by exact integer squared cell distance, the
    GIS "allocation" / service-area raster (who serves whom when the
    densest cells are the facilities).

    Distance: d2 = min(|dx|, 2^z - |dx|)^2 + dy^2 (x wraps, y does
    not); argmin ties break to the lexicographically smallest seed —
    all int64, both engines evaluate the identical algebra.

    Scale shape: seeds are a bounded TakeOrdered collect (n_seeds
    rows); the allocation is a BROADCAST crossJoin of the occupied
    frame against the seed dim folded by one min_by — per-cell work
    O(n_seeds), no shuffle beyond the existing counts aggregate."""
    n = 1 << z
    cells = _cells(tile_counts, cnt_col)
    seeds = [
        (int(r["x"]), int(r["y"]))
        for r in cells.orderBy(
            F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc()
        ).limit(n_seeds).collect()
    ]
    spark = tile_counts.sparkSession
    sdf = spark.createDataFrame(seeds, "sx long, sy long")
    j = cells.crossJoin(F.broadcast(sdf))
    adx = F.abs(F.col("x") - F.col("sx"))
    dx = F.least(adx, F.lit(n) - adx)
    dy = F.col("y") - F.col("sy")
    d2 = (dx * dx + dy * dy).alias("_d2")
    scored = j.select("x", "y", "cnt", "sx", "sy", d2)
    best = scored.groupBy("x", "y", "cnt").agg(
        F.min_by(
            F.struct("sx", "sy", "_d2"),
            F.struct("_d2", "sx", "sy"),
        ).alias("_b")
    )
    return best.select(
        F.lit(z).cast("int").alias("z"), "x", "y", "cnt",
        F.col("_b.sx").alias("seed_x"),
        F.col("_b.sy").alias("seed_y"),
        F.col("_b._d2").alias("d2"),
    )

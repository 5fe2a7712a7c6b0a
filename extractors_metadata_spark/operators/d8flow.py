"""D8 flow direction + flow accumulation over the sparse tile grid.

The D8 kernel (O'Callaghan & Mark 1984 — the flow-routing primitive
inside every hydrology toolbox) assigns each raster cell one outflow
pointer: the steepest strictly-descending 8-neighbor.  Flow
accumulation then counts, per cell, how many cells drain THROUGH it
(itself included) — ridge cells get 1, confluence cells the size of
their upstream catchment.  Here the "elevation" surface is the engine's
per-tile activity count (the same sparse (x, y, cnt) frame
terrain.slope_aspect and heatmap.tile_smooth consume), so accumulation
finds the DRAINAGE STRUCTURE of a crawl/scan density field: the cells
every local activity gradient funnels into.  Reference analog: none
(the reference renders single-dataset GeoJSON footprints,
sensorposition/terra_sensorposition.py:60-64); this widens J7 tiling
with the classic raster flow-routing kernel.

Semantics (all frozen, all exact int64):

- Candidates are OCCUPIED neighbors only (absent tiles are outside the
  observed surface — flow does not exit the support); x wraps mod 2^z,
  y rows off the pole edges drop.
- Strict descent: neighbor counts must be < the cell's own count, so
  the pointer graph is acyclic by construction (a functional forest
  draining into local minima).  Cells with no strictly-lower occupied
  neighbor are SINKS (dir = -1).
- Steepest: drop/dist compared exactly as steep2 = drop^2 * (2/dist^2)
  — 2*drop^2 for orthogonal neighbors, drop^2 for diagonals (squares
  exact below 2^63, safe for per-tile counts < 2^15.5; ties between an
  orthogonal and a diagonal at 2*do^2 = dd^2 are the exact 54.7-degree
  boundary and are frozen, like every tie, to the smallest direction
  index).  Direction indices: 0 +x, 1 +x+y, 2 +y, 3 -x+y, 4 -x,
  5 -x-y, 6 -y, 7 +x-y (tile-grid axes, +y = screen-south).
- acc(v) = |{u : v lies on the D8 pointer path from u}| (v included).

Scale shape: the candidate stage is the slope_aspect scatter idiom — a
constant x8 posexplode of a literal offsets array (pure codegen), then
ONE grid-keyed equi-join back to the counts frame (shuffle linear in
occupied tiles; no broadcast assumption — both sides are the same
frame).  Steepest-pointer selection is a min_by-family aggregate
(max_by over a struct ordering key), not a window sort.  Accumulation
iterates acc <- 1 + inflow-sum along the pointer forest: per round one
dst-keyed equi-join + map-side-combining sum, localCheckpoint-truncated
lineage (the cluster_pairs rule), early exit on the monotone total; the
round count equals the longest drainage path, which for an activity
surface is bounded by the count of distinct descending count values
along any path (<= max cnt).  Non-convergence within ``rounds`` raises
— no silent partial accumulation.  At continental-DEM path lengths the
standard scale fix is basin partitioning / pointer-doubling tree
contraction; the exposed ``rounds`` knob keeps the failure loud until
that path is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIRS = [
    (0, 1, 0),
    (1, 1, 1),
    (2, 0, 1),
    (3, -1, 1),
    (4, -1, 0),
    (5, -1, -1),
    (6, 0, -1),
    (7, 1, -1),
]


def _cells(tile_counts: DataFrame, cnt_col: str) -> DataFrame:
    return tile_counts.select(
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
        F.col(cnt_col).cast("long").alias("cnt"),
    )


def d8_pointers(cells: DataFrame, z: int) -> DataFrame:
    """The D8 pointer stage: (x, y, dir, nx, ny) — one row per NON-sink
    cell, pointing at its steepest strictly-lower occupied neighbor
    under the frozen (steep2 desc, dir asc) rule."""
    n = 1 << z
    offsets = F.array(
        *[
            F.struct(
                F.lit(d).alias("dir"),
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(2 if dx * dy == 0 else 1).alias("w"),
            )
            for d, dx, dy in _DIRS
        ]
    )
    nb = cells.select(
        F.col("x").alias("_nx"), F.col("y").alias("_ny"), F.col("cnt").alias("_ncnt")
    )
    cand = (
        cells.select("x", "y", "cnt", F.explode(offsets).alias("o"))
        .select(
            "x",
            "y",
            "cnt",
            F.col("o.dir").alias("dir"),
            F.col("o.w").alias("w"),
            ((F.col("x") + F.col("o.dx") + n) % n).alias("_nx"),
            (F.col("y") + F.col("o.dy")).alias("_ny"),
        )
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .join(nb, ["_nx", "_ny"])
        .filter(F.col("_ncnt") < F.col("cnt"))
    )
    dr = F.col("cnt") - F.col("_ncnt")
    return (
        cand.select(
            "x",
            "y",
            "dir",
            "_nx",
            "_ny",
            (dr * dr * F.col("w")).alias("steep2"),
            (-F.col("dir")).alias("_ndir"),
        )
        .groupBy("x", "y")
        .agg(
            F.max_by(
                F.struct(
                    F.col("dir"), F.col("_nx").alias("nx"), F.col("_ny").alias("ny")
                ),
                F.struct(F.col("steep2"), F.col("_ndir")),
            ).alias("best")
        )
        .select("x", "y", "best.dir", "best.nx", "best.ny")
    )


def d8_flow(
    tile_counts: DataFrame,
    z: int,
    cnt_col: str = "cnt",
    rounds: int = 64,
) -> DataFrame:
    """D8 steepest-descent pointers + flow accumulation over the sparse
    per-tile count surface at zoom ``z`` -> (z, x, y, cnt, dir, acc).
    dir = -1 marks sinks; acc counts the draining cells incl. self."""
    cells = _cells(tile_counts, cnt_col)
    nxt = d8_pointers(cells, z)

    edges = nxt.select("x", "y", "nx", "ny").localCheckpoint(eager=True)
    acc = cells.select("x", "y", F.lit(1).cast("long").alias("acc")).localCheckpoint(
        eager=True
    )
    total = acc.agg(F.sum("acc")).collect()[0][0]
    converged = False
    for _ in range(int(rounds)):
        inflow = (
            acc.join(edges, ["x", "y"])
            .groupBy(F.col("nx").alias("x"), F.col("ny").alias("y"))
            .agg(F.sum("acc").alias("_in"))
        )
        acc = (
            cells.select("x", "y")
            .join(inflow, ["x", "y"], "left")
            .select(
                "x", "y", (F.lit(1) + F.coalesce(F.col("_in"), F.lit(0))).alias("acc")
            )
            .localCheckpoint(eager=True)
        )
        new_total = acc.agg(F.sum("acc")).collect()[0][0]
        if new_total == total:
            converged = True
            break
        total = new_total
    if not converged:
        raise ValueError(
            f"d8_flow: accumulation did not converge within {rounds} rounds "
            "(drainage path longer than the bound — raise `rounds`)"
        )

    out = (
        cells.join(nxt.select("x", "y", "dir"), ["x", "y"], "left")
        .join(acc, ["x", "y"])
        .select(
            F.lit(z).alias("z"),
            "x",
            "y",
            "cnt",
            F.coalesce(F.col("dir"), F.lit(-1)).cast("int").alias("dir"),
            "acc",
        )
    )
    return out


def watershed(
    tile_counts: DataFrame,
    z: int,
    cnt_col: str = "cnt",
    rounds: int = 48,
) -> DataFrame:
    """Watershed basin labeling over the D8 pointer forest at zoom ``z``
    -> (z, x, y, sink_x, sink_y, basin_n): each cell labeled by the
    TERMINAL SINK its D8 path drains into, plus that basin's cell count.

    This is the POINTER-DOUBLING form d8_flow's docstring points at for
    continental path lengths: ptr(v) starts at next(v) (sinks point at
    themselves, making the doubling join total), and each round sets
    ptr <- ptr(ptr) — a self-equi-join on the pointer frame — so a path
    of length L settles in ceil(log2 L) rounds, not L.  Early exit when
    no pointer moved (one bounded count action per round); lineage
    localCheckpoint-truncated; non-convergence raises loudly.  Pointers
    settle exactly at sinks because sinks are fixpoints and strict
    descent leaves no cycles to trap the doubling.
    """
    cells = _cells(tile_counts, cnt_col)
    nxt = d8_pointers(cells, z)
    ptr = (
        cells.select("x", "y")
        .join(nxt.select("x", "y", "nx", "ny"), ["x", "y"], "left")
        .select(
            "x",
            "y",
            F.coalesce(F.col("nx"), F.col("x")).alias("px"),
            F.coalesce(F.col("ny"), F.col("y")).alias("py"),
        )
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(int(rounds)):
        hop = ptr.select(
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            F.col("px").alias("qx"),
            F.col("py").alias("qy"),
        )
        nxt_ptr = (
            ptr.join(hop, ["px", "py"])
            .select("x", "y", F.col("qx").alias("px"), F.col("qy").alias("py"))
            .localCheckpoint(eager=True)
        )
        moved = (
            nxt_ptr.alias("a")
            .join(ptr.alias("b"), ["x", "y"])
            .filter(
                (F.col("a.px") != F.col("b.px")) | (F.col("a.py") != F.col("b.py"))
            )
            .count()
        )
        ptr = nxt_ptr
        if moved == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"watershed: pointer doubling did not settle within {rounds} "
            "rounds (drainage path longer than 2^rounds — raise `rounds`)"
        )
    sizes = ptr.groupBy(
        F.col("px").alias("sink_x"), F.col("py").alias("sink_y")
    ).agg(F.count(F.lit(1)).alias("basin_n"))
    return (
        ptr.select(
            "x", "y", F.col("px").alias("sink_x"), F.col("py").alias("sink_y")
        )
        .join(sizes, ["sink_x", "sink_y"])
        .select(
            F.lit(z).alias("z"), "x", "y", "sink_x", "sink_y", "basin_n"
        )
    )

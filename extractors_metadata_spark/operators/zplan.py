"""Z-order range planner — bbox queries compiled to Morton key ranges.

The missing half of a Z-ordered layout (functions/zcurve.py writes the
key): at query time a spatial bbox must become a SET OF CONTIGUOUS KEY
RANGES so the scan can push them into sorted storage (parquet row-group
min/max pruning, Iceberg metadata filtering — the same decomposition
inside every Z-indexed store, e.g. the classic UB-tree region query).
This operator compiles many bboxes AT ONCE, data-parallel over the box
table: the standard quadtree descent — per level each surviving
quadrant splits in 4; children fully inside the box emit their aligned
Morton range, disjoint children prune, straddlers descend — followed by
an adjacent-range merge, so the output is the MINIMAL sorted range list
whose union is exactly the box.

Exactness: everything is integer shift/compare arithmetic.  An aligned
quadrant's Morton range is [z_value(corner), z_value(corner) + 4^h - 1]
with h the remaining depth — the corner's low bits are zero, so the
interleave of the corner IS the prefix range start; 4^h and the
level-wise shifts are compile-time literals (Spark shiftleft takes
literal counts — the CLAUDE.md rule — and the per-level loop makes
every shift literal).  The merge is the interval-union prev-end window
(ranges are disjoint and sorted, so adjacency is lo = prev_hi + 1).

Invariant (pinned by pytest and the oracle): per box,
sum(hi - lo + 1) == box area in cells, and range count <= the O(D *
perimeter) quadtree bound.

Scale shape: the box table is arbitrary-size (per-tenant/per-query
compilation at once); per level ONE x4 literal explode + codegen
classification — no joins, no shuffle until the final per-box merge
window over a BOUNDED range list (O(4*D) emissions per box before
merge at D levels).  Depth D is a compile-time constant (the grid
resolution of the layout being queried).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.zcurve import z_value


def z_range_plan(boxes: DataFrame, depth: int = 8, key_col: str = "key") -> DataFrame:
    """Compile cell-coordinate bboxes (key, x0, x1, y0, y1) on the
    2^depth grid into merged Morton ranges -> (key, range_lo, range_hi),
    sorted disjoint per key, union exactly the box."""
    if not (1 <= depth <= 16):
        raise ValueError("z_range_plan: depth must be in [1, 16]")
    d = int(depth)
    k = F.col(key_col)

    # level-0 state: the root quadrant (corner 0,0, side 2^d) — classified
    # below like every other quadrant so degenerate full-grid boxes emit.
    state = boxes.select(
        k.alias("key"),
        F.col("x0").cast("long").alias("x0"),
        F.col("x1").cast("long").alias("x1"),
        F.col("y0").cast("long").alias("y0"),
        F.col("y1").cast("long").alias("y1"),
        F.lit(0).cast("long").alias("cx"),
        F.lit(0).cast("long").alias("cy"),
    )
    emitted = []
    for lvl in range(d + 1):
        side = 1 << (d - lvl)  # cells per quadrant side at this level
        xlo = F.col("cx") * side
        ylo = F.col("cy") * side
        xhi = xlo + (side - 1)
        yhi = ylo + (side - 1)
        disjoint = (
            (xhi < F.col("x0"))
            | (xlo > F.col("x1"))
            | (yhi < F.col("y0"))
            | (ylo > F.col("y1"))
        )
        contained = (
            (xlo >= F.col("x0"))
            & (xhi <= F.col("x1"))
            & (ylo >= F.col("y0"))
            & (yhi <= F.col("y1"))
        )
        live = state.filter(~disjoint)
        emitted.append(
            live.filter(contained).select(
                "key",
                z_value(xlo, ylo).alias("range_lo"),
                (z_value(xlo, ylo) + F.lit((1 << (2 * (d - lvl))) - 1)).alias(
                    "range_hi"
                ),
            )
        )
        if lvl == d:
            break
        quads = F.array(
            *[
                F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
                for j in (0, 1)
                for i in (0, 1)
            ]
        )
        state = (
            live.filter(~contained)
            .select(
                "key",
                "x0",
                "x1",
                "y0",
                "y1",
                "cx",
                "cy",
                F.explode(quads).alias("q"),
            )
            .select(
                "key",
                "x0",
                "x1",
                "y0",
                "y1",
                (F.col("cx") * 2 + F.col("q.i")).alias("cx"),
                (F.col("cy") * 2 + F.col("q.j")).alias("cy"),
            )
        )
    raw = emitted[0]
    for e in emitted[1:]:
        raw = raw.unionByName(e)

    # adjacent-range merge: quadtree ranges are disjoint, so a new run
    # starts exactly when lo != prev_hi + 1 (the interval_union window)
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("range_lo")
    marked = raw.select(
        "key",
        "range_lo",
        "range_hi",
        F.when(
            F.lag("range_hi").over(w).isNull()
            | (F.col("range_lo") != F.lag("range_hi").over(w) + 1),
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    runs = marked.select(
        "key",
        "range_lo",
        "range_hi",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_run"),
    )
    return runs.groupBy("key", "_run").agg(
        F.min("range_lo").alias("range_lo"), F.max("range_hi").alias("range_hi")
    ).select(F.col("key").alias(key_col), "range_lo", "range_hi")

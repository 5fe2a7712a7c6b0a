"""Hierarchical cell-set compaction over the S2-style quad index.

The quadtree twin of Iceberg manifest compaction: a covering produced at
one fine level (``polyfill``, per-point ``s2_encode``) usually contains
many COMPLETE sibling quartets — four level-L cells that tile one
level-(L-1) cell exactly.  ``s2_compact`` replaces every complete
quartet by its parent, recursively, yielding the canonical minimal cell
set for the same region (what s2geometry calls CellUnion normalization);
``s2_uncompact`` expands back to a uniform level.  Compact coverings
shrink broadcast dims, index tables, and equi-join fan-outs by up to
4^k over solid regions.

Scale design:
- one round per level, finest -> coarsest, BOUNDED by MAX_LEVEL (26);
  each round filters the current set to one level, groups by parent id
  (map-side combinable count + a <=4-element collect), and unions the
  survivors back — every shuffle is over the shrinking cell set, never
  the data that produced it;
- rounds localCheckpoint (tiny JVM-only iterative frame — exactly the
  lineage-truncation case CLAUDE.md carves out), so the final plan is a
  scan of materialized cells, not a 26-round union tower;
- ``s2_uncompact`` is a pure-codegen sequence explode with fan-out
  exactly 4^(target - level) per cell — the caller chooses the blowup.

All arithmetic is the frozen id layout ``(face << 57) | (pos << 5) |
level`` (``functions/s2quad.py``) in exact int64 shifts — the DuckDB
oracle replays every round as a generated CTE stage (the
``_hilbert_stages_sql`` pattern).

Reference analog: none (the reference has no spatial index); this
completes the engine's index family with the coverage-normalization op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.s2quad import MAX_LEVEL

_POS_MASK = (1 << 52) - 1


def _parent_expr(cell: Column, child_level: int) -> Column:
    """Parent id at child_level - 1, exact int64 shifts (frozen layout)."""
    face = F.shiftright(cell, 57)
    pos = F.shiftright(cell, 5).bitwiseAND(F.lit(_POS_MASK))
    return (
        F.shiftleft(face, 57)
        .bitwiseOR(F.shiftleft(F.shiftright(pos, 2), 5))
        .bitwiseOR(F.lit(child_level - 1))
    )


def s2_compact(
    cells: DataFrame, cell_col: str = "cell", min_level: int = 0
) -> DataFrame:
    """Canonical minimal cell set: merge complete sibling quartets into
    parents, recursively down to ``min_level``.  Input cells may mix
    levels but must be non-overlapping (no cell an ancestor of another —
    the polyfill/encode output shape).  Returns one column ``cell``."""
    cur = cells.select(F.col(cell_col).alias("cell")).distinct()
    max_lv = cur.agg(
        F.max(F.col("cell").bitwiseAND(F.lit(31))).alias("l")
    ).collect()[0]["l"]
    if max_lv is None:
        return cur
    cur = cur.localCheckpoint(eager=True)
    for lv in range(int(max_lv), int(min_level), -1):
        at = cur.filter(F.col("cell").bitwiseAND(F.lit(31)) == lv)
        rest = cur.filter(F.col("cell").bitwiseAND(F.lit(31)) != lv)
        grouped = (
            at.withColumn("_p", _parent_expr(F.col("cell"), lv))
            .groupBy("_p")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sort_array(F.collect_list("cell")).alias("_cs"),
            )
        )
        merged = grouped.select(
            F.explode(
                F.when(F.col("_n") == 4, F.array(F.col("_p"))).otherwise(
                    F.col("_cs")
                )
            ).alias("cell")
        )
        cur = rest.unionByName(merged).localCheckpoint(eager=True)
    return cur


def s2_uncompact(
    cells: DataFrame, level: int, cell_col: str = "cell"
) -> DataFrame:
    """Expand every cell to its complete set of ``level`` descendants
    (cells already at ``level`` pass through; finer cells are rejected by
    the precondition below).  Pure codegen; fan-out 4^(level - L)."""
    base = (
        cells.select(F.col(cell_col).alias("cell"))
        .filter(F.col("cell").bitwiseAND(F.lit(31)) <= level)
        .selectExpr(
            "cell >> 57 AS _face",
            f"(cell >> 5) & {_POS_MASK} AS _pos",
            # shiftleft with an expression-valued count (variable per row)
            f"CAST(({level} - (cell & 31)) * 2 AS INT) AS _k2",
        )
    )
    return base.selectExpr(
        "_face", "_pos", "_k2",
        "explode(sequence(CAST(0 AS BIGINT), shiftleft(CAST(1 AS BIGINT), _k2) - 1)) AS _i"
    ).selectExpr(
        f"(_face << 57) | ((shiftleft(_pos, _k2) | _i) << 5) | {level} AS cell"
    )

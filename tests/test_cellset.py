"""Quadtree cell-set compaction (operators/cellset.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.operators.cellset import s2_compact, s2_uncompact


def _cell(face: int, pos: int, level: int) -> int:
    return (face << 57) | (pos << 5) | level


def _df(spark, cells):
    return spark.createDataFrame(pd.DataFrame({"cell": cells}))


def test_full_quartets_merge_recursively(spark):
    # all 16 level-2 descendants of one level-0 cell -> that level-0 cell
    cells = [_cell(3, p, 2) for p in range(16)]
    got = [r.cell for r in s2_compact(_df(spark, cells)).collect()]
    assert got == [_cell(3, 0, 0)]


def test_partial_quartet_survives_verbatim(spark):
    cells = [_cell(0, p, 2) for p in (0, 1, 2, 5)]  # 3 siblings + a stray
    got = sorted(r.cell for r in s2_compact(_df(spark, cells)).collect())
    assert got == sorted(cells)


def test_mixed_levels_and_cross_face_isolation(spark):
    # face 1: full quartet at level 3 (merges once, then stalls: siblings
    # of the new level-2 cell are absent); face 2: untouched level-1 cell
    cells = [_cell(1, (7 << 2) | i, 3) for i in range(4)] + [_cell(2, 1, 1)]
    got = sorted(r.cell for r in s2_compact(_df(spark, cells)).collect())
    assert got == sorted([_cell(1, 7, 2), _cell(2, 1, 1)])


def test_uncompact_roundtrip(spark):
    base = [_cell(4, 5, 2), _cell(4, 3, 3)]
    exp = s2_uncompact(_df(spark, base), level=5)
    n = exp.count()
    assert n == 4 ** 3 + 4 ** 2  # fan-out 4^(5-2) + 4^(5-3)
    assert exp.select(F.col("cell").bitwiseAND(F.lit(31))).distinct().collect()[0][0] == 5
    # compacting the expansion recovers the original canonical set
    back = sorted(r.cell for r in s2_compact(exp, min_level=0).collect())
    assert back == sorted(base)


def test_min_level_floor(spark):
    cells = [_cell(0, p, 2) for p in range(16)]
    got = sorted(r.cell for r in s2_compact(_df(spark, cells), min_level=1).collect())
    assert got == sorted(_cell(0, p, 1) for p in range(4))

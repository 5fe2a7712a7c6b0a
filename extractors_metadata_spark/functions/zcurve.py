"""Z-order (Morton) curve keys — pure JVM Column arithmetic.

Engine-added capability: multi-dimensional data layout for scan pruning. At
100 TB the dominant cost of a spatial query is the FILES it touches; parquet
footer min/max statistics prune a file only if rows inside it are clustered
on the filtered dimensions. Sorting by (x) clusters x but scatters y; the
Z-order curve interleaves the bits of both so a file's row range maps to a
compact 2-D region — the same layout trick behind Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered rewrites, built here from
first principles (public magic-number Morton encoding).

Everything is exact int64 arithmetic (shift/or/and on non-negative inputs
< 2^32), so the key is bit-identical in any engine — the DuckDB oracle
replays the identical five mask steps. No UDF, no Python: the whole key is
whole-stage-codegen'd.

Reference analog: the reference's plot grid (Range x Pass integer fields,
``/root/reference/sensorposition/plotid_by_latlon.py:43-46``) is its only
notion of spatial locality; the north rule's Iceberg-table framing makes
write-side layout a first-class engine concern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 32-bit value's bits to the even positions
# of a 64-bit word: x = (x | x<<s) & m, classic Morton magic numbers.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits(c: Column) -> Column:
    """Spread the low 32 bits of a non-negative long into even bit positions."""
    c = c.cast("long")
    for sh, m in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(m))
    return c


def z_value(x: Column, y: Column) -> Column:
    """Interleave two non-negative ints < 2^32 into one Morton key:
    bit k of x lands at position 2k, bit k of y at 2k+1. Strictly monotone
    in the quadtree order, so a contiguous z range is a compact 2-D block."""
    return spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))


def z_stages_sql(base_cte: str, keep_cols: str) -> str:
    """The identical interleave as generated CTE stages (DuckDB oracle
    replay; staged rather than nested — naive inlining doubles the
    expression per mask step, the _hilbert_stages_sql lesson). ``base_cte``
    must expose BIGINT columns ``zx``/``zy`` plus ``keep_cols``; the
    returned chain ends in CTE ``zfin`` with ``keep_cols, zval``."""
    stages, prev = [], base_cte
    for k, (sh, m) in enumerate(_SPREAD_STEPS):
        stages.append(
            f"zs{k} AS (SELECT {keep_cols}, "
            f"((zx | (zx << {sh})) & {m}) AS zx, "
            f"((zy | (zy << {sh})) & {m}) AS zy FROM {prev})"
        )
        prev = f"zs{k}"
    stages.append(
        f"zfin AS (SELECT {keep_cols}, (zx | (zy << 1)) AS zval FROM {prev})"
    )
    return ",\n            ".join(stages)

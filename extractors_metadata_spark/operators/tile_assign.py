"""Raster<->vector slippy tile assignment (J7; north-rule mandate).

One Arrow pass computes the inclusive tile ranges per footprint bbox, then the
(z, x, y) fan-out happens JVM-side via ``explode(sequence(...))`` — the tile
list itself never materializes in Python, so a footprint spanning thousands of
tiles at z=14 costs only codegen'd row generation.

Reference analog: the integer (Range, Pass) plot-grid bucketing
(``/root/reference/sensorposition/plotid_by_latlon.py:43-46``), upgraded per
BASELINE.json north_star to WebMercator Z/X/Y tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import tiles


def _ranges_udf(zooms: tuple[int, ...]):
    @pandas_udf("array<struct<z:int, x0:long, x1:long, y0:long, y1:long>>")
    def _f(min_lat: pd.Series, min_lon: pd.Series,
           max_lat: pd.Series, max_lon: pd.Series) -> pd.Series:
        mn_la = min_lat.to_numpy(np.float64)
        mn_lo = min_lon.to_numpy(np.float64)
        mx_la = max_lat.to_numpy(np.float64)
        mx_lo = max_lon.to_numpy(np.float64)
        per_z = []
        for z in zooms:
            x0, x1, y0, y1 = tiles.bbox_tile_ranges(mn_la, mn_lo, mx_la, mx_lo, z)
            per_z.append((x0, x1, y0, y1))
        out = [
            [
                {"z": z, "x0": int(per_z[j][0][i]), "x1": int(per_z[j][1][i]),
                 "y0": int(per_z[j][2][i]), "y1": int(per_z[j][3][i])}
                for j, z in enumerate(zooms)
            ]
            for i in range(len(mn_la))
        ]
        return pd.Series(out)

    return _f


def tile_assign(
    df: DataFrame,
    zooms: tuple[int, ...] = (9, 10, 11, 12, 13, 14),
    id_cols: tuple[str, ...] = ("url",),
    bbox_cols: tuple[str, str, str, str] = ("min_lat", "min_lon", "max_lat", "max_lon"),
) -> DataFrame:
    """footprints -> one row per (id, z, x, y) tile intersecting the bbox.

    Single pass over the input: one Arrow batch computes all zooms' ranges as
    an array column, then three JVM explodes (zoom, x, y) generate the rows —
    the upstream plan is scanned exactly once regardless of len(zooms).
    """
    rng = _ranges_udf(tuple(zooms))(*bbox_cols)
    return (
        df.select(*id_cols, F.explode(rng).alias("_r"))
        .select(
            *id_cols,
            F.col("_r.z").alias("z"),
            F.explode(F.sequence("_r.x0", "_r.x1")).alias("x"),
            F.col("_r.y0").alias("_y0"),
            F.col("_r.y1").alias("_y1"),
        )
        .select(*id_cols, "z", "x", F.explode(F.sequence("_y0", "_y1")).alias("y"))
    )

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


def _range_udf(zoom: int):
    @pandas_udf("x0 long, x1 long, y0 long, y1 long")
    def _f(min_lat: pd.Series, min_lon: pd.Series,
           max_lat: pd.Series, max_lon: pd.Series) -> pd.DataFrame:
        x0, x1, y0, y1 = tiles.bbox_tile_ranges(
            min_lat.to_numpy(np.float64), min_lon.to_numpy(np.float64),
            max_lat.to_numpy(np.float64), max_lon.to_numpy(np.float64), zoom,
        )
        return pd.DataFrame({"x0": x0, "x1": x1, "y0": y0, "y1": y1})

    return _f


def tile_assign(
    df: DataFrame,
    zooms: tuple[int, ...] = (9, 10, 11, 12, 13, 14),
    id_cols: tuple[str, ...] = ("url",),
    bbox_cols: tuple[str, str, str, str] = ("min_lat", "min_lon", "max_lat", "max_lon"),
) -> DataFrame:
    """footprints -> one row per (id, z, x, y) tile intersecting the bbox."""
    parts = []
    for z in zooms:
        rng = _range_udf(z)(*bbox_cols)
        part = (
            df.select(*id_cols, rng.alias("_r"))
            .select(
                *id_cols,
                F.lit(z).alias("z"),
                F.explode(F.sequence("_r.x0", "_r.x1")).alias("x"),
                F.col("_r.y0").alias("_y0"),
                F.col("_r.y1").alias("_y1"),
            )
            .select(
                *id_cols, "z", "x", F.explode(F.sequence("_y0", "_y1")).alias("y")
            )
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

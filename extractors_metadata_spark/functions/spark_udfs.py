"""Arrow-batched pandas UDF wrappers around the NumPy kernels.

These are the ONLY Python-side execution points in the engine's hot path, and
each is pure NumPy over whole Arrow batches (input_hint: "no per-row Python").
Everything else (parsing, string building, joins, explodes) stays JVM-side
inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from . import hexgrid, s2quad, tiles
from .geodesy import haversine_m
from .textmeta import extract_text, footprint_from_metadata

FOOTPRINT_SCHEMA = (
    "centroid_lat double, centroid_lon double, "
    "sw_lon double, sw_lat double, se_lon double, se_lat double, "
    "ne_lon double, ne_lat double, nw_lon double, nw_lat double, "
    "min_lat double, max_lat double, min_lon double, max_lon double"
)

FOOTPRINT_CELLS_SCHEMA = FOOTPRINT_SCHEMA + ", cell_r9 long, s2_cell long, cell_r13 long"


def footprint_cells_udf(h3_res: int = 9, s2_level: int = 16):
    """Fused footprint + H3 + S2 in ONE Arrow pass (each extra scalar UDF adds
    a full JVM<->Python round trip over the table; at 10^12 rows that is the
    dominant serial overhead)."""

    @pandas_udf(FOOTPRINT_CELLS_SCHEMA)
    def _f(px: pd.Series, py: pd.Series, cbx: pd.Series, cby: pd.Series,
           fx: pd.Series, fy: pd.Series) -> pd.DataFrame:
        c_lat, c_lon, ring = footprint_from_metadata(
            px.to_numpy(np.float64), py.to_numpy(np.float64),
            cbx.to_numpy(np.float64), cby.to_numpy(np.float64),
            fx.to_numpy(np.float64), fy.to_numpy(np.float64),
        )
        lons = ring[:, :4, 0]
        lats = ring[:, :4, 1]
        return pd.DataFrame(
            {
                "centroid_lat": c_lat,
                "centroid_lon": c_lon,
                "sw_lon": ring[:, 0, 0], "sw_lat": ring[:, 0, 1],
                "se_lon": ring[:, 1, 0], "se_lat": ring[:, 1, 1],
                "ne_lon": ring[:, 2, 0], "ne_lat": ring[:, 2, 1],
                "nw_lon": ring[:, 3, 0], "nw_lat": ring[:, 3, 1],
                "min_lat": lats.min(axis=1), "max_lat": lats.max(axis=1),
                "min_lon": lons.min(axis=1), "max_lon": lons.max(axis=1),
                "cell_r9": hexgrid.h3_encode(c_lat, c_lon, h3_res),
                "s2_cell": s2quad.s2_encode(c_lat, c_lon, s2_level),
                # join-resolution cell precomputed here so the spatial join
                # needs no second encode pass (north star: encode cells once
                # in batched columnar passes)
                "cell_r13": hexgrid.h3_encode(c_lat, c_lon, 13),
            }
        )

    return _f


def footprint_udf():
    """(pos_x, pos_y, cambox_x, cambox_y, fov_x, fov_y) -> footprint struct."""

    @pandas_udf(FOOTPRINT_SCHEMA)
    def _f(px: pd.Series, py: pd.Series, cbx: pd.Series, cby: pd.Series,
           fx: pd.Series, fy: pd.Series) -> pd.DataFrame:
        c_lat, c_lon, ring = footprint_from_metadata(
            px.to_numpy(np.float64), py.to_numpy(np.float64),
            cbx.to_numpy(np.float64), cby.to_numpy(np.float64),
            fx.to_numpy(np.float64), fy.to_numpy(np.float64),
        )
        lons = ring[:, :4, 0]
        lats = ring[:, :4, 1]
        return pd.DataFrame(
            {
                "centroid_lat": c_lat,
                "centroid_lon": c_lon,
                "sw_lon": ring[:, 0, 0], "sw_lat": ring[:, 0, 1],
                "se_lon": ring[:, 1, 0], "se_lat": ring[:, 1, 1],
                "ne_lon": ring[:, 2, 0], "ne_lat": ring[:, 2, 1],
                "nw_lon": ring[:, 3, 0], "nw_lat": ring[:, 3, 1],
                "min_lat": lats.min(axis=1), "max_lat": lats.max(axis=1),
                "min_lon": lons.min(axis=1), "max_lon": lons.max(axis=1),
            }
        )

    return _f


def h3_udf(res: int):
    @pandas_udf("long")
    def _f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            hexgrid.h3_encode(lat.to_numpy(np.float64), lon.to_numpy(np.float64), res)
        )

    return _f


def s2_udf(level: int):
    @pandas_udf("long")
    def _f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            s2quad.s2_encode(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level)
        )

    return _f


def tile_xy_udf(zoom: int):
    @pandas_udf("x long, y long")
    def _f(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        x, y = tiles.tile_xyz(lat.to_numpy(np.float64), lon.to_numpy(np.float64), zoom)
        return pd.DataFrame({"x": x, "y": y})

    return _f


def haversine_udf():
    @pandas_udf("double")
    def _f(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        return pd.Series(
            haversine_m(
                lat1.to_numpy(np.float64), lon1.to_numpy(np.float64),
                lat2.to_numpy(np.float64), lon2.to_numpy(np.float64),
            )
        )

    return _f


def extract_text_udf():
    """Re-runs the frozen extraction on html bytes (invariant verification op).

    Row-wise decode is inherent to variable-length binary -> text; the regex
    engine does the per-byte work in C. Used by the verify op, not the hot path
    (the hot path trusts the stored ``text`` column after verification).
    """

    @pandas_udf("string")
    def _f(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return _f

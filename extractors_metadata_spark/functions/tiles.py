"""Slippy-map Z/X/Y tile math (public OSM formula), vectorized NumPy.

Engine-frozen formulas (also the pytest + DuckDB-oracle formulas, so they must
never drift):

    x = floor((lon + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(lat_rad) + 1/cos(lat_rad)) / pi) / 2 * 2^z)

with x wrapped mod 2^z and y clamped to [0, 2^z - 1]; WebMercator latitude
clamped to +-85.05112878 deg.

Reference analog: the plot grid's integer (Range, Pass) fields
(``/root/reference/sensorposition/plotid_by_latlon.py:43-46``) are the
reference's discrete spatial bucketing; the north rule upgrades this to slippy
raster tiles (BASELINE.json north_star "raster-to-vector tile assignment").
"""

from __future__ import annotations

import numpy as np

MERC_MAX_LAT = 85.05112878


def tile_xyz(lat, lon, z):
    """(lat, lon, zoom) -> (x, y) tile indices; vectorized."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERC_MAX_LAT, MERC_MAX_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    z = np.asarray(z, dtype=np.int64)
    n = (np.int64(1) << z).astype(np.float64)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    # literal ln(tan + 1/cos) — the SAME IEEE expression the DuckDB oracles
    # evaluate (arcsinh(tan(x)) is mathematically equal but not bit-identical;
    # a ulp difference at a floor() boundary would break exact-equality checks)
    y = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    n_i = np.int64(1) << z
    x = np.mod(x, n_i)
    y = np.clip(y, 0, n_i - 1)
    return x, y


def tile_bounds(z, x, y):
    """Tile -> (lon_w, lat_s, lon_e, lat_n) bounds (inverse of tile_xyz)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = (np.int64(1) << z).astype(np.float64)
    lon_w = x / n * 360.0 - 180.0
    lon_e = (x + 1.0) / n * 360.0 - 180.0
    lat_n = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    lat_s = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1.0) / n))))
    return lon_w, lat_s, lon_e, lat_n


def bbox_tile_ranges(min_lat, min_lon, max_lat, max_lon, z):
    """bbox -> inclusive tile index ranges (x0, x1, y0, y1) at zoom z; vectorized.

    The fan-out count per row is (x1-x0+1)*(y1-y0+1); the tile_assign operator
    explodes these ranges JVM-side with ``sequence()`` so the expansion never
    materializes in Python.
    """
    x0, y1 = tile_xyz(min_lat, min_lon, z)  # south-west: min lat -> max y
    x1, y0 = tile_xyz(max_lat, max_lon, z)
    return x0, x1, y0, y1


def quadkey_expr(x_name: str, y_name: str, z: int):
    """Bing-maps quadkey for slippy tile (x, y) at literal zoom ``z`` as
    a pure-codegen Column: digit i = 2*bit_i(y) + bit_i(x), MSB first.
    Quadkeys nest by prefix (a tile's children share its quadkey prefix),
    which is what makes them the string-keyed sibling of the z-order
    layout: prefix range scans == quadtree descent. Bit extraction uses
    the exact pow(2,k)-cast idiom (F.shiftright needs a literal count;
    exact to 2^52 — z <= 30 by far)."""
    from pyspark.sql import functions as F

    return F.expr(
        f"array_join(transform(sequence(1, {int(z)}), i -> "
        f"cast((({y_name} div cast(pow(2.0, {int(z)} - i) as long)) % 2) * 2"
        f" + (({x_name} div cast(pow(2.0, {int(z)} - i) as long)) % 2)"
        f" as string)), '')"
    )

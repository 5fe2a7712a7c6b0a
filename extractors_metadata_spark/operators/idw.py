"""IDW raster interpolation: inverse-distance-weighted value surface.

The rendering/analysis raster the heatmap suite was missing: per occupied
tile, an inverse-distance-weighted mean of the values of events in the
tile's 3x3 neighborhood — the standard local IDW surface (smooth where
tile_smooth's box kernel is blocky, value-weighted where it is
count-weighted).

Geometry runs in MERCATOR TILE SPACE, quantized ONCE to exact integer
MILLITILES (~3.8 cm at z20): tile centers are then exact ints
(1000*y + 500), squared distances are exact int64, and the weight
w = 1e6 / (d2_mt + 250000)  (i.e. 1 / (d2_tiles + 0.25))
is ONE identical-path division of exact integers — so every per-term
fixed-point rounding is decided on IDENTICAL doubles in both engines.

Why quantize first (measured, not theoretical): the slippy-y ln/tan/cos
chain drifts a few ulps between NumPy SIMD and DuckDB libm; multiplied by
2^z that drift reaches ~0.4 units of a 1e-9 fixed point — per-term
rounding flipped on ~60% of tiles before this fix.  Quantizing the
transcendental ONCE at millitile resolution leaves a single boundary
with ~5e-7 flip probability per event (the same residual every tile-floor
oracle carries) instead of a boundary per weight term.

Scale: one Arrow pass (mercator + quantize); a LITERAL x9 scatter explode
(each event contributes to its 3x3 neighbor tiles — the tile_smooth
shape); ONE map-side-combining aggregate keyed by tile.  x wraps mod 2^z
for the OUTPUT key (distances use the unwrapped neighbor index — callers
near the antimeridian should recenter first); y rows off the poles drop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: millitiles per tile (the one quantization of the transcendental chain)
MT = 1000


def _merc_mt_udf(z: int):
    n = float(1 << z)

    @F.pandas_udf("struct<tx: long, ty: long>")
    def merc_mt(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la = np.radians(lat.to_numpy(np.float64))
        mx = (lon.to_numpy(np.float64) + 180.0) / 360.0
        my = (1.0 - np.log(np.tan(la) + 1.0 / np.cos(la)) / np.pi) / 2.0
        tx = np.rint(mx * n * MT).astype(np.int64)
        ty = np.rint(my * n * MT).astype(np.int64)
        return pd.DataFrame({"tx": tx, "ty": ty})

    return merc_mt


def idw_surface(
    df: DataFrame,
    z: int = 20,
    value_col: str = "value",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(x, y, n_contrib, den_fp, num_fp, idw_fp): per tile the 1e-9
    fixed-point weight/weighted-value sums over the 3x3 neighborhood and
    the 1e-6 fixed-point IDW value num/den."""
    n = 1 << z
    m = _merc_mt_udf(z)(F.col(lat_col), F.col(lon_col))
    base = df.select(F.col(value_col).alias("_v"), m.alias("_m")).select(
        "_v",
        F.col("_m.tx").alias("tx"),
        F.col("_m.ty").alias("ty"),
        F.expr(f"_m.tx div {MT}").alias("ex"),
        F.expr(f"_m.ty div {MT}").alias("ey"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    sc = base.select(
        "_v", "tx", "ty", F.explode(offs).alias("o"), "ex", "ey"
    ).select(
        "_v", "tx", "ty",
        (F.col("ex") + F.col("o.dx")).alias("nx"),
        (F.col("ey") + F.col("o.dy")).alias("ny"),
    ).filter((F.col("ny") >= 0) & (F.col("ny") < n))
    # exact int64 millitile distance to the neighbor tile's center
    dmx = F.col("tx") - (F.col("nx") * MT + MT // 2)
    dmy = F.col("ty") - (F.col("ny") * MT + MT // 2)
    d2 = dmx * dmx + dmy * dmy
    w = F.lit(float(MT * MT)) / (d2 + F.lit(MT * MT // 4)).cast("double")
    w_fp = F.bround(w * 1000000000.0, 0).cast("long")
    vw_fp = F.bround(F.col("_v") * w * 1000000000.0, 0).cast("long")
    agg = (
        sc.select(
            ((F.col("nx") + n) % n).alias("x"),
            F.col("ny").alias("y"),
            w_fp.alias("_w"),
            vw_fp.alias("_vw"),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_contrib"),
            F.sum("_w").alias("den_fp"),
            F.sum("_vw").alias("num_fp"),
        )
    )
    idw = F.bround(
        F.col("num_fp").cast("double") / F.col("den_fp").cast("double") * 1000000.0,
        0,
    ).cast("long")
    return agg.select("x", "y", "n_contrib", "den_fp", "num_fp", idw.alias("idw_fp"))

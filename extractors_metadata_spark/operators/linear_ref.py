"""Linear referencing: snap points to a reference polyline.

The rail/road/transect primitive (the reference's gantry moves on rails —
``/root/reference/sensorposition/terra_sensorposition.py`` positions are
rail offsets): for each point, find the nearest segment of a reference
path and report (segment, cross-track distance, along-track chainage) —
"where along the line, and how far off it".

Exactness design — NO runtime transcendentals anywhere:
- points and the path project to an equirectangular plane whose scale
  constants (deg->m, the anchor-latitude cosine) are PYTHON-precomputed
  literals shared verbatim by both engines;
- per-segment projection t = clamp(dot/len2, 0, 1), len2 and the
  cumulative chainage prefix are precomputed literals too, so every
  runtime op is +,-,*,/ plus one IEEE sqrt (correctly rounded in every
  engine) — identical-path doubles end to end;
- the winner is the lexicographic min of struct(d2, seg) — a pure-codegen
  ``array_min`` over the per-segment structs (no explode, no shuffle, no
  UDF); ties break to the lower segment index identically everywhere;
- outputs are half-up integer centimeters (the scan_legs 0-decimal
  rounding pairing).

Scale: the path is a tiny constant (broadcast by value into the plan);
the operator is a NARROW projection — it fuses into whatever scan feeds
it, zero exchanges.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R_MEAN = 6371008.8
DEG = math.pi / 180.0 * R_MEAN


def path_constants(
    path_lonlat: list[tuple[float, float]], anchor_lat: float
) -> dict:
    """Precompute the shared literals: scaled vertices, per-segment len2,
    per-segment length and cumulative chainage (all Python floats — the
    single source both engines inline)."""
    cos0 = math.cos(math.radians(anchor_lat))
    xs = [lon * (cos0 * DEG) for lon, lat in path_lonlat]
    ys = [lat * DEG for lon, lat in path_lonlat]
    len2, seglen, cum = [], [], [0.0]
    for k in range(len(path_lonlat) - 1):
        l2 = (xs[k + 1] - xs[k]) ** 2 + (ys[k + 1] - ys[k]) ** 2
        len2.append(l2)
        seglen.append(math.sqrt(l2))
        cum.append(cum[-1] + math.sqrt(l2))
    return {
        "xs": xs, "ys": ys, "len2": len2, "seglen": seglen,
        "cum": cum[:-1], "xscale": cos0 * DEG, "yscale": DEG,
    }


def snap_to_path(
    df: DataFrame,
    consts: dict,
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(id, seg, dist_cm, chain_cm): nearest path segment, cross-track
    distance and along-track chainage in exact integer centimeters."""
    px = F.col(lon_col) * F.lit(consts["xscale"])
    py = F.col(lat_col) * F.lit(consts["yscale"])
    segs = []
    for k in range(len(consts["len2"])):
        ax, ay = F.lit(consts["xs"][k]), F.lit(consts["ys"][k])
        bx, by = F.lit(consts["xs"][k + 1]), F.lit(consts["ys"][k + 1])
        t_raw = ((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / F.lit(
            consts["len2"][k]
        )
        t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        dx = px - (ax + t * (bx - ax))
        dy = py - (ay + t * (by - ay))
        d2 = dx * dx + dy * dy
        chain = F.lit(consts["cum"][k]) + t * F.lit(consts["seglen"][k])
        segs.append(
            F.struct(
                d2.alias("d2"), F.lit(k).alias("seg"), chain.alias("chain")
            )
        )
    best = F.array_min(F.array(*segs))
    return df.select(
        F.col(id_col),
        best["seg"].cast("int").alias("seg"),
        F.round(F.sqrt(best["d2"]) * 100.0, 0).cast("long").alias("dist_cm"),
        F.round(best["chain"] * 100.0, 0).cast("long").alias("chain_cm"),
    )

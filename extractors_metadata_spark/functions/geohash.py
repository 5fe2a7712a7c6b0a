"""Geohash encoding (public Gustavo-Niemeyer scheme) — pure JVM codegen.

Completes the engine's index-family surface (H3-style hex, S2-style quad,
slippy XYZ, Z-order Morton, geohash): geohash is the interoperability
format — Elasticsearch, Redis, Lucene and most web APIs speak it — so an
engine exporting spatial keys needs it even though the hex index is the
better pruning structure (documented trade-off: geohash cells are lat/lon
rectangles with 2:1 aspect flips per level and unequal areas by latitude;
the Lambert-projected hex grid keeps areas uniform).

Construction (public knowledge): quantize lon to 2^ceil(5n/2) buckets and
lat to 2^floor(5n/2), bit-interleave starting with LONGITUDE, emit 5-bit
groups through the base-32 alphabet. The interleave reuses
``zcurve.spread_bits`` (lon on even positions via the x-slot, lat on odd)
and everything is exact int64 + table lookup, so the DuckDB oracle replays
it bit-identically (staged mask CTEs + substr lookups).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .zcurve import z_value

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Geohash string of ``precision`` base-32 chars (precision <= 12 keeps
    the 5*precision interleaved bits inside int64)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2  # lon leads, so it owns any extra bit
    lat_bits = bits // 2
    qlon = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits)))
    qlat = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits)))
    # clamp the closed upper edge (lat=90, lon=180) into the last bucket
    qlon = F.least(qlon, F.lit((1 << lon_bits) - 1)).cast("long")
    qlat = F.least(qlat, F.lit((1 << lat_bits) - 1)).cast("long")
    # The MSB (value position bits-1) must be a LON bit. z_value puts its
    # x argument on EVEN value positions: with odd total bits the MSB
    # position is even -> lon rides x; with even total bits it is odd ->
    # lon rides the shifted y slot (and the two widths are equal).
    z = z_value(qlon, qlat) if bits % 2 else z_value(qlat, qlon)
    chars = [
        F.substring(
            F.lit(_B32),
            (F.shiftrightunsigned(z, i * 5) % 32 + 1).cast("int"),
            1,
        )
        for i in range(precision - 1, -1, -1)
    ]
    return F.concat(*chars)


def geohash_sql(precision: int = 8) -> str:
    """The identical encoding as DuckDB SQL stages — single source for the
    oracle twin. Returns a CTE chain: caller supplies a CTE named
    ``ghbase`` with columns (key cols..., glat, glon) and appends
    ``SELECT ..., gh FROM ghfin``."""
    from .zcurve import z_stages_sql

    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon_q = (
        f"least(CAST(FLOOR((glon + 180.0) / 360.0 * {float(1 << lon_bits)}) AS BIGINT), "
        f"{(1 << lon_bits) - 1})"
    )
    lat_q = (
        f"least(CAST(FLOOR((glat + 90.0) / 180.0 * {float(1 << lat_bits)}) AS BIGINT), "
        f"{(1 << lat_bits) - 1})"
    )
    # parity rule mirrors geohash_encode: odd total bits -> lon on the even
    # (zx) slot; even -> lon on the shifted (zy) slot
    zx, zy = (lon_q, lat_q) if bits % 2 else (lat_q, lon_q)
    parts = " || ".join(
        f"substr('{_B32}', CAST(((zval >> {i * 5}) & 31) + 1 AS INT), 1)"
        for i in range(precision - 1, -1, -1)
    )
    return f"""
        ghq AS (
          SELECT *, {zx} AS zx, {zy} AS zy
          FROM ghbase),
        {z_stages_sql("ghq", "* EXCLUDE (zx, zy)")},
        ghfin AS (SELECT *, {parts} AS gh FROM zfin)
    """

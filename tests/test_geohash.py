"""Geohash encoding (functions/geohash.py) vs the public reference
algorithm (bisection interleave) and known vectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook bisection implementation (public algorithm)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, is_lon = [], [], True
    while len(bits) < 5 * precision:
        if is_lon:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        is_lon = not is_lon
    for i in range(precision):
        val = 0
        for b in bits[i * 5:(i + 1) * 5]:
            val = val * 2 + b
        out.append(_B32[val])
    return "".join(out)


def test_geohash_known_vectors(spark):
    from extractors_metadata_spark.functions.geohash import geohash_encode
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (42.605, -5.603)], "lat double, lon double"
    )
    got = [
        r["g"]
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 11).alias("g")
        ).collect()
    ]
    assert got == ["u4pruydqqvj", "ezs42s000es"]


@pytest.mark.parametrize("precision", [4, 5, 8, 9, 12])
def test_geohash_matches_reference_bisection(spark, precision):
    from extractors_metadata_spark.functions.geohash import geohash_encode
    from pyspark.sql import functions as F

    rng = np.random.default_rng(precision)
    pdf = pd.DataFrame(
        {
            "lat": rng.uniform(-89.9, 89.9, 60),
            "lon": rng.uniform(-179.9, 179.9, 60),
        }
    )
    df = spark.createDataFrame(pdf)
    got = [
        r["g"]
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), precision).alias("g")
        ).collect()
    ]
    want = [
        _ref_geohash(la, lo, precision)
        for la, lo in zip(pdf["lat"], pdf["lon"])
    ]
    assert got == want


def test_geohash_edge_clamp(spark):
    from extractors_metadata_spark.functions.geohash import geohash_encode
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(90.0, 180.0), (-90.0, -180.0)], "lat double, lon double"
    )
    got = [
        r["g"]
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 6).alias("g")
        ).collect()
    ]
    assert got == [_ref_geohash(89.9999999, 179.9999999, 6), "000000"]

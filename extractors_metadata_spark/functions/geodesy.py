"""From-scratch vectorized geodesy: UTM <-> WGS84, haversine, local planar meters.

The reference (``/root/reference/sensorposition/error_estimation.py:22-41``) relies on
the public ``utm`` package's transverse-Mercator series (standard USGS/Snyder
formulation, public knowledge). That package is not installed here, so the same
series expansion is implemented from scratch in NumPy and validated against the
golden constants the reference left inline, e.g.
``from_latlon(33.0745, -111.97475) == (409017.7305875577, 3659968.4471026724, 12, 'S')``
(``error_estimation.py:23``) and the ~1.1 cm round-trip error (``:29``).

All functions accept scalars or ndarrays and are loop-free.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid / transverse Mercator constants (public spec).
K0 = 0.9996
E = 0.00669438  # first eccentricity squared
E2 = E * E
E3 = E2 * E
E_P2 = E / (1.0 - E)  # second eccentricity squared

_SQRT_E = np.sqrt(1.0 - E)
_E = (1.0 - _SQRT_E) / (1.0 + _SQRT_E)
_E2 = _E * _E
_E3 = _E2 * _E
_E4 = _E3 * _E
_E5 = _E4 * _E

M1 = 1.0 - E / 4.0 - 3.0 * E2 / 64.0 - 5.0 * E3 / 256.0
M2 = 3.0 * E / 8.0 + 3.0 * E2 / 32.0 + 45.0 * E3 / 1024.0
M3 = 15.0 * E2 / 256.0 + 45.0 * E3 / 1024.0
M4 = 35.0 * E3 / 3072.0

P2 = 3.0 / 2.0 * _E - 27.0 / 32.0 * _E3 + 269.0 / 512.0 * _E5
P3 = 21.0 / 16.0 * _E2 - 55.0 / 32.0 * _E4
P4 = 151.0 / 96.0 * _E3 - 417.0 / 128.0 * _E5
P5 = 1097.0 / 512.0 * _E4

R = 6378137.0  # WGS84 equatorial radius, meters
R_MEAN = 6371008.8  # mean earth radius for haversine, meters

ZONE_LETTERS = "CDEFGHJKLMNPQRSTUVWXX"


def latlon_to_zone_number(lat, lon):
    """Standard UTM zone from longitude (Norway/Svalbard exceptions included)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    zone = (np.floor((lon + 180.0) / 6.0) + 1).astype(np.int64)
    zone = np.clip(zone, 1, 60)
    # Norway exception
    norway = (lat >= 56.0) & (lat < 64.0) & (lon >= 3.0) & (lon < 12.0)
    zone = np.where(norway, 32, zone)
    # Svalbard exceptions
    sval = (lat >= 72.0) & (lat <= 84.0)
    zone = np.where(sval & (lon >= 0.0) & (lon < 9.0), 31, zone)
    zone = np.where(sval & (lon >= 9.0) & (lon < 21.0), 33, zone)
    zone = np.where(sval & (lon >= 21.0) & (lon < 33.0), 35, zone)
    zone = np.where(sval & (lon >= 33.0) & (lon < 42.0), 37, zone)
    return zone


def latitude_to_zone_letter(lat):
    """Latitude band letter C..X for -80..84; used only for display parity."""
    lat = np.asarray(lat, dtype=np.float64)
    idx = np.clip(((lat + 80.0) / 8.0).astype(np.int64), 0, len(ZONE_LETTERS) - 1)
    letters = np.array(list(ZONE_LETTERS))
    return letters[idx]


def from_latlon(lat, lon, force_zone_number=None):
    """WGS84 lat/lon (deg) -> (easting, northing, zone_number) vectorized.

    Matches the classic UTM series used by the reference's ``utm==0.4.1``
    dependency (golden check in tests/test_geodesy.py).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)

    lat_rad = np.radians(lat)
    lat_sin = np.sin(lat_rad)
    lat_cos = np.cos(lat_rad)
    lat_tan = lat_sin / lat_cos
    lat_tan2 = lat_tan * lat_tan
    lat_tan4 = lat_tan2 * lat_tan2

    if force_zone_number is None:
        zone = latlon_to_zone_number(lat, lon)
    else:
        zone = np.full_like(lat, force_zone_number, dtype=np.int64)

    lon_rad = np.radians(lon)
    central_lon = (np.asarray(zone, dtype=np.float64) - 1.0) * 6.0 - 180.0 + 3.0
    central_lon_rad = np.radians(central_lon)

    n = R / np.sqrt(1.0 - E * lat_sin * lat_sin)
    c = E_P2 * lat_cos * lat_cos

    a = lat_cos * (lon_rad - central_lon_rad)
    a2 = a * a
    a3 = a2 * a
    a4 = a3 * a
    a5 = a4 * a
    a6 = a5 * a

    m = R * (
        M1 * lat_rad
        - M2 * np.sin(2.0 * lat_rad)
        + M3 * np.sin(4.0 * lat_rad)
        - M4 * np.sin(6.0 * lat_rad)
    )

    easting = (
        K0
        * n
        * (
            a
            + a3 / 6.0 * (1.0 - lat_tan2 + c)
            + a5 / 120.0 * (5.0 - 18.0 * lat_tan2 + lat_tan4 + 72.0 * c - 58.0 * E_P2)
        )
        + 500000.0
    )
    northing = K0 * (
        m
        + n
        * lat_tan
        * (
            a2 / 2.0
            + a4 / 24.0 * (5.0 - lat_tan2 + 9.0 * c + 4.0 * c * c)
            + a6
            / 720.0
            * (61.0 - 58.0 * lat_tan2 + lat_tan4 + 600.0 * c - 330.0 * E_P2)
        )
    )
    northing = np.where(lat < 0.0, northing + 10000000.0, northing)
    return easting, northing, zone


def to_latlon(easting, northing, zone_number, northern=True):
    """UTM -> WGS84 lat/lon (deg), inverse series; vectorized."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    zone_number = np.asarray(zone_number, dtype=np.float64)

    x = easting - 500000.0
    y = np.where(northern, northing, northing - 10000000.0)

    m = y / K0
    mu = m / (R * M1)

    p_rad = (
        mu
        + P2 * np.sin(2.0 * mu)
        + P3 * np.sin(4.0 * mu)
        + P4 * np.sin(6.0 * mu)
        + P5 * np.sin(8.0 * mu)
    )

    p_sin = np.sin(p_rad)
    p_sin2 = p_sin * p_sin
    p_cos = np.cos(p_rad)
    p_tan = p_sin / p_cos
    p_tan2 = p_tan * p_tan
    p_tan4 = p_tan2 * p_tan2

    ep_sin = 1.0 - E * p_sin2
    ep_sin_sqrt = np.sqrt(ep_sin)

    n = R / ep_sin_sqrt
    rr = (1.0 - E) / ep_sin

    c = E_P2 * p_cos * p_cos
    c2 = c * c

    d = x / (n * K0)
    d2 = d * d
    d3 = d2 * d
    d4 = d3 * d
    d5 = d4 * d
    d6 = d5 * d

    lat_rad = p_rad - (p_tan / rr) * (
        d2 / 2.0 - d4 / 24.0 * (5.0 + 3.0 * p_tan2 + 10.0 * c - 4.0 * c2 - 9.0 * E_P2)
    ) - (p_tan / rr) * (
        -d6 / 720.0 * (61.0 + 90.0 * p_tan2 + 298.0 * c + 45.0 * p_tan4 - 252.0 * E_P2 - 3.0 * c2)
    )
    lon_rad = (
        d
        - d3 / 6.0 * (1.0 + 2.0 * p_tan2 + c)
        + d5 / 120.0 * (5.0 - 2.0 * c + 28.0 * p_tan2 - 3.0 * c2 + 8.0 * E_P2 + 24.0 * p_tan4)
    ) / p_cos

    lat = np.degrees(lat_rad)
    lon = np.degrees(lon_rad) + ((zone_number - 1.0) * 6.0 - 180.0 + 3.0)
    return lat, lon


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (mean-radius haversine); vectorized."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * R_MEAN * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def equirect_m(lat1, lon1, lat2, lon2):
    """Local equirectangular planar distance in meters (frozen engine formula for
    point<->polygon-edge distances; the reference computed planar distance in the
    layer's projected SRS, ``plotid_by_latlon.py:64`` — at plot scale the two agree
    to well under the reference's own ~cm accuracy bound)."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    latm = np.radians((lat1 + lat2) / 2.0)
    dx = np.radians(lon2 - lon1) * np.cos(latm) * R_MEAN
    dy = np.radians(lat2 - lat1) * R_MEAN
    return np.sqrt(dx * dx + dy * dy)

"""Frozen text extraction + metadata/footprint kernels.

``extract_text`` is the engine's FROZEN pure function of the raw ``html`` bytes.
The per-row invariant mandated by BASELINE.json input_hint — byte-identical
extracted text per url vs the stored ``text`` column — is enforced by applying
exactly this function (tests hash-lock it). It deliberately uses only ``re`` and
a fixed entity table (no HTML-parser library whose behavior could drift).

Reference analog: the netcdf extractor's binary-payload -> text-metadata
rendering (``/root/reference/netcdf/terra_netcdf.py:33-58``) and the cleaner's
``clean_metadata`` normalization (``/root/reference/cleaner/terra_mdcleaner.py:81``).

Footprint math (engine-frozen; analog of the reference's gantry-position +
camera-box-offset + field-of-view footprint, root ``README.md:17-27`` and
``sensorposition/test.json:22-24,55-58``):

    center_x = pos_x + cambox_x          # gantry meters, +x = north
    center_y = pos_y + cambox_y          # gantry meters, +y = west
    easting  = SE_E - gy                 # error_estimation.py:36 (x offset sign)
    northing = SE_N + (gx - 3.8)         # error_estimation.py:37
    bbox     = corners at center +- fov/2, converted UTM zone 12 -> WGS84

with (SE_E, SE_N) = from_latlon(33.0745, -111.97475), the surveyed SE corner
(``error_estimation.py:9,15-16``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .geodesy import from_latlon, to_latlon

# --- frozen text extraction -------------------------------------------------

_SCRIPT_RE = re.compile(rb"(?is)<script\b.*?</script>")
_STYLE_RE = re.compile(rb"(?is)<style\b.*?</style>")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(rb"\s+")
_ENTITIES = [
    (b"&nbsp;", b" "),
    (b"&amp;", b"&"),
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
]


def extract_text(html_bytes: bytes) -> str:
    """FROZEN: html bytes -> visible text. Do not modify (hash-locked goldens)."""
    if html_bytes is None:
        return ""
    s = _SCRIPT_RE.sub(b" ", html_bytes)
    s = _STYLE_RE.sub(b" ", s)
    s = _TAG_RE.sub(b" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    s = _WS_RE.sub(b" ", s).strip()
    return s.decode("utf-8", errors="replace")


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# --- gantry -> WGS84 footprint kernel ----------------------------------------

# Surveyed SE corner and gantry extents (reference error_estimation.py:4-16).
SE_LAT, SE_LON = 33.0745, -111.97475
GANTRY_X0 = 3.8
UTM_ZONE = 12
_se = from_latlon(np.array([SE_LAT]), np.array([SE_LON]))
SE_E, SE_N = float(_se[0][0]), float(_se[1][0])


def gantry_to_latlon(gx, gy):
    """Gantry meters (x north from SE at 3.8, y west) -> WGS84; vectorized."""
    gx = np.asarray(gx, dtype=np.float64)
    gy = np.asarray(gy, dtype=np.float64)
    easting = SE_E - gy
    northing = SE_N + (gx - GANTRY_X0)
    return to_latlon(easting, northing, UTM_ZONE, True)


def footprint_from_metadata(pos_x, pos_y, cambox_x, cambox_y, fov_x, fov_y):
    """Vectorized: gantry metadata columns -> centroid + bbox ring.

    Returns (centroid_lat, centroid_lon, ring) where ring is an (n, 5, 2)
    array of [lon, lat] closed rings ordered SW, SE, NE, NW, SW — the same
    one-extra-nesting GeoJSON polygon shape the reference builds at
    ``terra_sensorposition.py:73-78``.
    """
    pos_x = np.asarray(pos_x, dtype=np.float64)
    pos_y = np.asarray(pos_y, dtype=np.float64)
    cx = pos_x + np.asarray(cambox_x, dtype=np.float64)
    cy = pos_y + np.asarray(cambox_y, dtype=np.float64)
    hx = np.asarray(fov_x, dtype=np.float64) / 2.0
    hy = np.asarray(fov_y, dtype=np.float64) / 2.0

    c_lat, c_lon = gantry_to_latlon(cx, cy)

    # corner gantry coords: x-+hx (south/north), y+-hy (west/east)
    sw_lat, sw_lon = gantry_to_latlon(cx - hx, cy + hy)
    se_lat, se_lon = gantry_to_latlon(cx - hx, cy - hy)
    ne_lat, ne_lon = gantry_to_latlon(cx + hx, cy - hy)
    nw_lat, nw_lon = gantry_to_latlon(cx + hx, cy + hy)

    ring = np.stack(
        [
            np.stack([sw_lon, sw_lat], axis=-1),
            np.stack([se_lon, se_lat], axis=-1),
            np.stack([ne_lon, ne_lat], axis=-1),
            np.stack([nw_lon, nw_lat], axis=-1),
            np.stack([sw_lon, sw_lat], axis=-1),
        ],
        axis=1,
    )
    return c_lat, c_lon, ring

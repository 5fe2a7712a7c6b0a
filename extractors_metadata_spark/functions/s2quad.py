"""S2-style cube-face Hilbert-quad cell index, from scratch in NumPy.

Implements the public S2 construction — unit-sphere point -> cube face ->
quadratic (u,v)->(s,t) transform -> leaf (i,j) at 2^30 -> Hilbert curve position
-> 64-bit cell ID truncated to a level — using the textbook iterative Hilbert
xy->d algorithm (public knowledge) rather than s2geometry's lookup tables, so
IDs are deterministic and locality-preserving but not claimed bit-identical to
the C++ library (none installed to validate against).

Cell ID layout (engine-frozen): id = (face << 57) | (pos_L << 5) | level with
pos_L = hilbert_d >> (2*(MAX_LEVEL-L)); MAX_LEVEL=26 keeps the 52-bit position
inside a sign-safe int64 (level-26 cells are ~0.6 m -- far finer than any level
the engine uses).

No reference analog (the reference has no spatial index at all — it full-scans
polygons, ``plotid_by_latlon.py:51``); mandated by BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 26  # pos fits in 52 bits -> id layout [face:3][pos:52][level:5], sign-safe


def _lonlat_to_xyz(lat, lon):
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    z = np.atleast_1d(np.asarray(z, dtype=np.float64))
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # face: 0 +x, 1 +y, 2 +z, 3 -x, 4 -y, 5 -z (S2 convention)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # (u_numerator, v_numerator, denominator) per face, S2 public convention
    u = np.empty_like(x)
    v = np.empty_like(x)
    specs = {
        0: (y, z, x),
        1: (-x, z, y),
        2: (-x, -y, z),
        3: (z, y, x),
        4: (z, -x, y),
        5: (-y, -x, z),
    }
    for f, (un, vn, den) in specs.items():
        m = face == f
        if np.any(m):
            u[m] = un[m] / den[m]
            v[m] = vn[m] / den[m]
    return face, u, v


def _uv_to_st(u):
    """S2 quadratic projection (public spec): even area distribution on the cube."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(0.0, 1.0 + 3.0 * u)),
        1.0 - 0.5 * np.sqrt(np.maximum(0.0, 1.0 - 3.0 * u)),
    )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _hilbert_xy_to_d(order: int, x, y):
    """Textbook iterative Hilbert curve index (vectorized over points)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    return d


def _hilbert_d_to_xy(order: int, d):
    d = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    s = np.int64(1)
    top = np.int64(1) << order
    while s < top:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_n = np.where(swap, y_f, x_f)
        y_n = np.where(swap, x_f, y_f)
        x = x_n + s * rx
        y = y_n + s * ry
        t //= 4
        s <<= 1
    return x, y


def s2_encode(lat, lon, level) -> np.ndarray:
    """(lat, lon, level<=26) -> int64 S2-style cell ID; vectorized."""
    lat = np.asarray(lat, dtype=np.float64)
    level_arr = np.broadcast_to(np.asarray(level, dtype=np.int64), lat.shape if lat.shape else (1,))
    x, y, z = _lonlat_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s = _uv_to_st(u)
    t = _uv_to_st(v)
    n = np.int64(1) << MAX_LEVEL
    i = np.clip((s * n).astype(np.int64), 0, n - 1)
    j = np.clip((t * n).astype(np.int64), 0, n - 1)
    d = _hilbert_xy_to_d(MAX_LEVEL, i, j)
    pos = d >> (2 * (MAX_LEVEL - level_arr))
    return (face << 57) | (pos << 5) | level_arr


def s2_parent(cell, parent_level):
    """Truncate a cell ID to a coarser level (hierarchy containment)."""
    cell = np.asarray(cell, dtype=np.int64)
    parent_level = np.asarray(parent_level, dtype=np.int64)
    face = cell >> 57
    level = cell & 31
    pos = (cell >> 5) & ((np.int64(1) << 52) - 1)
    pos_p = pos >> (2 * (level - parent_level))
    return (face << 57) | (pos_p << 5) | parent_level

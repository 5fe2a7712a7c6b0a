"""Encoded Polyline (polyline6) serialization of per-user tracks.

The Google Encoded Polyline Algorithm Format is the interchange string
every web-mapping stack (Maps, OSRM, Valhalla, Leaflet plugins) speaks:
per point, delta-encode the integer coordinates, zigzag the sign into
the low bit, emit little-endian 5-bit chunks with a continuation bit,
offset by 63 into printable ASCII. This operator emits the 1e-6-degree
variant (polyline6 — Valhalla's default), over the repo's established
micro-degree quantize-once integers, so the output round-trips through
any public polyline6 decoder.

Exactness contract: the input is int64 micro-degrees (the dtw/bround
path); delta, zigzag (2|v| - 1 for negatives, 2v otherwise) and the
5-bit chunking are pure integer/string ops, so the DuckDB oracle
replays the encoding CHARACTER-FOR-CHARACTER with the chunk loop
unrolled to 7 fixed CASE stages (covers |v| < 2^34 — the first
absolute coordinate ~2.2e8 zigzagged needs 6).

Bounds ARE the semantics: tracks are the first ``max_len`` points by
(ts, event_id) — the dtw trace-segmentation cap.

Scale shape: one user-keyed window + groupBy (the only exchange), then
one Arrow batch per partition; encoding is O(len) integer work per
track. Reference parity: the geojson footprint strings of
full_day_to_tiles.py:24-33, re-expressed in the wire format a tile
server actually serves.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _encode_value(v: int) -> str:
    s = v * 2 if v >= 0 else (-v) * 2 - 1
    out = []
    while s >= 0x20:
        out.append(chr(63 + 0x20 + (s & 0x1F)))
        s >>= 5
    out.append(chr(63 + s))
    return "".join(out)


def encode_track(lats: list[int], lons: list[int]) -> str:
    """Polyline-encode one track of integer coordinates (lat first per
    point, deltas after the first point — the published algorithm)."""
    out = []
    py = px = 0
    for y, x in zip(lats, lons):
        out.append(_encode_value(int(y) - py))
        out.append(_encode_value(int(x) - px))
        py, px = int(y), int(x)
    return "".join(out)


def _polyline_udf():
    @F.pandas_udf("string")
    def enc(ys: pd.Series, xs: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_track(y, x) for y, x in zip(ys, xs)], dtype="object"
        )

    return enc


def polyline_tracks(tracks: DataFrame) -> DataFrame:
    """(user_id, n_pts, polyline) from a dtw.user_tracks-shaped frame
    (u, n, xs, ys) where xs/ys are micro-degree ints (ys = lat)."""
    return tracks.select(
        F.col("u").alias("user_id"),
        F.col("n").cast("long").alias("n_pts"),
        _polyline_udf()(F.col("ys"), F.col("xs")).alias("polyline"),
    )

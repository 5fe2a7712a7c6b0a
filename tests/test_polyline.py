"""Encoded Polyline (operators/polyline.py): the PUBLISHED Google spec
example as a byte golden, an independent from-spec decoder round-trip,
and the Spark path."""

from __future__ import annotations

import datetime as dt


def _decode(s: str) -> list[tuple[int, int]]:
    """Independent from-spec decoder (written fresh here, not shared
    with the operator): 5-bit chunks, continuation bit, zigzag."""
    vals, i = [], 0
    while i < len(s):
        res, shift = 0, 0
        while True:
            b = ord(s[i]) - 63
            i += 1
            res |= (b & 0x1F) << shift
            shift += 5
            if b < 0x20:
                break
        vals.append(~(res >> 1) if res & 1 else res >> 1)
    pts, y, x = [], 0, 0
    for j in range(0, len(vals), 2):
        y += vals[j]
        x += vals[j + 1]
        pts.append((y, x))
    return pts


def test_google_spec_golden():
    """The example from the published algorithm doc: (38.5,-120.2),
    (40.7,-120.95), (43.252,-126.453) at 1e5 -> '_p~iF~ps|U_ulLnnqC_mqNvxq`@'."""
    from extractors_metadata_spark.operators.polyline import encode_track

    lats = [3850000, 4070000, 4325200]
    lons = [-12020000, -12095000, -12645300]
    assert encode_track(lats, lons) == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"


def test_roundtrip_negative_and_zero_deltas():
    from extractors_metadata_spark.operators.polyline import encode_track

    lats = [33076471, 33076471, 33076400, -5, 0]
    lons = [-111974900, -111974901, -111974901, 7, 0]
    assert _decode(encode_track(lats, lons)) == list(zip(lats, lons))


def test_spark_polyline_tracks(spark):
    from extractors_metadata_spark.operators.dtw import user_tracks
    from extractors_metadata_spark.operators.polyline import (
        polyline_tracks,
    )

    rows = [
        (0, i, dt.datetime(2016, 5, 1, 0, 0, i), -12020000 + 100 * i,
         3850000 + 50 * i)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, qx long, qy long"
    )
    out = polyline_tracks(user_tracks(df)).collect()[0]
    assert out["n_pts"] == 3
    assert _decode(out["polyline"]) == [
        (3850000 + 50 * i, -12020000 + 100 * i) for i in range(3)
    ]

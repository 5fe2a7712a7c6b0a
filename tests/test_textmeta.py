"""Frozen text extraction + footprint kernel goldens (byte-identical invariant)."""

import numpy as np
import pytest

from extractors_metadata_spark.functions.textmeta import (
    extract_text,
    footprint_from_metadata,
    gantry_to_latlon,
    text_sha256,
)

# hash-locked goldens: if extract_text's behavior drifts, these fail.
GOLDENS = [
    (
        b"<html><head><title>T</title><style>b{}</style></head>"
        b'<body><h1>Hi &amp; bye</h1><script type="application/json" id="x">{"a":1}</script>'
        b"<p>tail</p></body></html>",
        "T Hi & bye tail",  # <title> text is visible text (kept by design)
    ),
    (b"", ""),
    (b"plain text no tags", "plain text no tags"),
    (b"<p>a</p>\n\n<p>b</p>\t c &lt;x&gt; &quot;q&quot; &#39;s&#39; &nbsp;", 'a b c <x> "q" \'s\''),
    (b"<script>bad</script>ok<SCRIPT a=b>x</script>done", "ok done"),
]


def test_extract_text_goldens():
    for html, expected in GOLDENS:
        assert extract_text(html) == expected


def test_extract_text_hash_locked():
    assert (
        text_sha256(extract_text(GOLDENS[0][0]))
        == "04c9536a9b8ca19f22a2858a340b9fb519b9aee5562e39e11bac80666e7653ec"
    )


def test_extract_text_invalid_utf8():
    # errors='replace' — never raises, deterministic replacement
    out = extract_text(b"<p>ab\xff\xfecd</p>")
    assert out == "ab��cd"


def test_gantry_anchor():
    # gantry (3.8, 0) is the surveyed SE corner (error_estimation.py:4,9)
    lat, lon = gantry_to_latlon(np.array([3.8]), np.array([0.0]))
    assert float(lat[0]) == pytest.approx(33.0745, abs=2e-7)
    assert float(lon[0]) == pytest.approx(-111.97475, abs=2e-7)


def test_footprint_golden_testjson():
    """test.json:22-24,55-58 values -> frozen centroid/ring regression."""
    c_lat, c_lon, ring = footprint_from_metadata(
        np.array([203.6]), np.array([2.499]), np.array([0.827]), np.array([0.710]),
        np.array([2.673]), np.array([1.647]),
    )
    assert float(c_lat[0]) == pytest.approx(33.07630917784451, abs=1e-12)
    assert float(c_lon[0]) == pytest.approx(-111.97480433274623, abs=1e-12)
    r = ring[0]
    assert r.shape == (5, 2)
    assert np.allclose(r[0], r[4])  # closed
    assert np.allclose(
        r[:4],
        [
            [-111.97481302153685, 33.07629705503763],
            [-111.97479537805152, 33.07629719297597],
            [-111.97479564395326, 33.07632130065082],
            [-111.97481328744338, 33.07632116271234],
        ],
        atol=1e-12,
    )
    # ring is ~fov-sized: 2.673 m north-south, 1.647 m east-west
    from extractors_metadata_spark.functions.geodesy import haversine_m

    ns = haversine_m(r[1][1], r[1][0], r[2][1], r[2][0])
    ew = haversine_m(r[0][1], r[0][0], r[1][1], r[1][0])
    assert float(ns) == pytest.approx(2.673, abs=0.01)
    assert float(ew) == pytest.approx(1.647, abs=0.01)


def test_footprint_zero_fov_degenerates_to_point():
    c_lat, c_lon, ring = footprint_from_metadata(
        np.array([100.0]), np.array([10.0]), np.array([0.0]), np.array([0.0]),
        np.array([0.0]), np.array([0.0]),
    )
    assert np.allclose(ring[0][:, 0], float(c_lon[0]))
    assert np.allclose(ring[0][:, 1], float(c_lat[0]))

"""UTM/haversine kernels vs the reference's inline golden numbers
(/root/reference/sensorposition/error_estimation.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extractors_metadata_spark.functions import geodesy as g

SE_LAT, SE_LON = 33.0745, -111.97475


def test_from_latlon_golden():
    # error_estimation.py:23: (409017.7305875577, 3659968.4471026724, 12, 'S')
    e, n, z = g.from_latlon(SE_LAT, SE_LON)
    assert float(e) == pytest.approx(409017.7305875577, abs=1e-6)
    assert float(n) == pytest.approx(3659968.4471026724, abs=1e-6)
    assert int(z) == 12
    assert str(g.latitude_to_zone_letter(SE_LAT)) == "S"


def test_corner_goldens():
    # error_estimation.py:62,66,70
    for lat, lon, ge, gn in [
        (33.0745666667, -111.9750833333, 408986.6849914966, 3659976.1272547124),
        (33.0765333333, -111.9750833333, 408988.710283526, 3660194.1676153513),
        (33.0765166667, -111.9747833333, 409016.6953067189, 3660192.059754602),
    ]:
        e, n, _ = g.from_latlon(lat, lon)
        assert float(e) == pytest.approx(ge, abs=1e-6)
        assert float(n) == pytest.approx(gn, abs=1e-6)


def test_roundtrip_error_bound():
    # reference bound: ~1.1 cm (error_estimation.py:29); ours must be <= that
    e, n, z = g.from_latlon(SE_LAT, SE_LON)
    lat, lon = g.to_latlon(e, n, z, True)
    e2, n2, _ = g.from_latlon(lat, lon)
    assert abs(float(e - e2)) < 0.011
    assert abs(float(n - n2)) < 0.011


def test_offset_math_golden():
    # error_estimation.py:35-41: meter offsets SE -> NW-ish point
    e, n, z = g.from_latlon(SE_LAT, SE_LON)
    new_x, new_y = float(e) - 22.135, float(n) + (207.3 - 3.8)
    assert new_x == pytest.approx(408995.5955875577, abs=1e-6)
    assert new_y == pytest.approx(3660171.9471026724, abs=1e-6)
    lat, lon = g.to_latlon(new_x, new_y, 12, True)
    e2, n2, _ = g.from_latlon(lat, lon)
    # round-trips to within the reference's own error (~0.011, 0.0002)
    assert abs(float(e2) - new_x) < 0.011
    assert abs(float(n2) - new_y) < 0.011
    # survey discrepancy vs NW corner ~ (6.9, -22.2) m (error_estimation.py:47-50)
    nwe, nwn, _ = g.from_latlon(33.0765333333, -111.9750833333)
    assert new_x - float(nwe) == pytest.approx(6.885304, abs=1e-3)
    assert new_y - float(nwn) == pytest.approx(-22.220513, abs=1e-3)


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-79.9, max_value=83.9),
    lon=st.floats(min_value=-179.9, max_value=179.9),
)
def test_utm_roundtrip_property(lat, lon):
    # Accuracy is a function of distance from the zone's CENTRAL MERIDIAN,
    # not latitude: inside a standard zone (|dlon| <= 3.5 deg) the truncated
    # Kruger series round-trips < 5 cm, but the Norway/Svalbard zone
    # EXCEPTIONS (which the kernel implements) legitimately place points up
    # to ~9 deg from the CM, where the same series gives decimetres
    # (hypothesis discovered lat=72, lon=32 -> zone 35, dlon = 5 deg,
    # 0.106 m; measured envelope < 0.35 m across all exception regions).
    # The engine's production envelope (plot fields ~33N, |lat| <= 66
    # radius-join bound) never enters the exception zones.
    e, n, z = g.from_latlon(lat, lon)
    lat2, lon2 = g.to_latlon(e, n, z, lat >= 0)
    err = float(g.haversine_m(lat, lon, float(lat2), float(lon2)))
    dlon = abs(lon - (int(z) * 6 - 183))
    assert err < (0.05 if dlon <= 3.5 else 0.6)


def test_haversine_known():
    # equator 1 degree of longitude ~ 111.19 km (mean radius)
    d = g.haversine_m(0.0, 0.0, 0.0, 1.0)
    assert float(d) == pytest.approx(111195, rel=1e-3)
    assert float(g.haversine_m(10.0, 20.0, 10.0, 20.0)) == 0.0


def test_equirect_close_to_haversine_at_plot_scale():
    d1 = g.equirect_m(33.0745, -111.97475, 33.0746, -111.97480)
    d2 = g.haversine_m(33.0745, -111.97475, 33.0746, -111.97480)
    assert abs(float(d1) - float(d2)) < 0.01

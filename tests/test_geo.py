"""Kernel tests for WKB codec, ray-cast PIP, haversine, convex hull."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mass_georeferencing_spark.functions.geo import (
    PreparedPolygon,
    convex_hull,
    decode_wkb,
    haversine_m,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
    wkb_rings,
)

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
HOLE = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]])


def test_wkb_point_roundtrip():
    gtype, (lon, lat) = decode_wkb(wkb_point(-77.03, 38.90))
    assert gtype == 1
    assert (lon, lat) == (-77.03, 38.90)


def test_wkb_polygon_roundtrip():
    buf = wkb_polygon([SQUARE, HOLE])
    rings = wkb_rings(buf)
    assert len(rings) == 2
    np.testing.assert_array_equal(rings[0], SQUARE)
    np.testing.assert_array_equal(rings[1], HOLE)


def test_wkb_multipolygon_roundtrip():
    shifted = SQUARE + 100.0
    buf = wkb_multipolygon([[SQUARE], [shifted]])
    rings = wkb_rings(buf)
    assert len(rings) == 2
    np.testing.assert_array_equal(rings[1], shifted)


def test_pip_square_with_hole():
    prep = PreparedPolygon([SQUARE, HOLE])
    lon = np.array([5.0, 5.0, -1.0, 2.0, 11.0])
    lat = np.array([2.0, 5.0, 5.0, 2.0, 5.0])
    # (5,2) inside; (5,5) in hole -> out; (-1,5) out; (2,2) in; (11,5) out
    np.testing.assert_array_equal(
        prep.contains(lon, lat), [True, False, False, True, False]
    )


def test_pip_empty_and_degenerate():
    prep = PreparedPolygon([])
    assert not prep.contains(np.array([0.0]), np.array([0.0]))[0]


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-20, max_value=30, allow_nan=False),
    st.floats(min_value=-20, max_value=30, allow_nan=False),
)
def test_pip_square_property(lon, lat):
    prep = PreparedPolygon([SQUARE])
    got = prep.contains(np.array([lon]), np.array([lat]))[0]
    # strict interior / strict exterior must be exact; boundary may go either way
    if 0 < lon < 10 and 0 < lat < 10:
        assert got
    elif lon < 0 or lon > 10 or lat < 0 or lat > 10:
        assert not got


def test_distance_deg():
    prep = PreparedPolygon([SQUARE])
    d = prep.distance_deg(np.array([5.0, 15.0, -3.0]), np.array([5.0, 5.0, 0.0]))
    assert d[0] == 0.0
    assert d[1] == pytest.approx(5.0)
    assert d[2] == pytest.approx(3.0)


def test_haversine_known():
    # DC -> NYC ~ 328 km
    d = haversine_m(np.array([-77.0369]), np.array([38.9072]), np.array([-74.0060]), np.array([40.7128]))
    assert 320_000 < d[0] < 340_000
    assert haversine_m(np.array([1.0]), np.array([2.0]), np.array([1.0]), np.array([2.0]))[0] == 0.0


def test_convex_hull_square():
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5], [2, 3]], dtype=float)
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (10, 0), (10, 10), (0, 10)}


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-50, 50), st.floats(-50, 50)), min_size=3, max_size=30))
def test_convex_hull_contains_all(points):
    pts = np.array(points, dtype=float)
    hull = convex_hull(pts)
    if len(hull) < 3:
        return
    ring = np.vstack([hull, hull[:1]])
    prep = PreparedPolygon([ring])
    # every input point is inside or within epsilon of the hull boundary
    d = prep.distance_deg(pts[:, 0], pts[:, 1])
    assert (d < 1e-6).all()

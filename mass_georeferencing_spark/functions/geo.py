"""Geometry kernels: WKB codec, ray-casting point-in-polygon, haversine, hulls.

The reference delegates all geometry to PostGIS (``ST_INTERSECTS`` in every
``collexpoly_*`` query, batch_georeferencing/queries.py:71 et al.; ``ST_Union`` /
``ST_ConvexHull`` / ``ST_Distance`` in batch_georeferencing/functions.py:26-61).
Spark has no geometry type, so geometries travel as WKB ``BinaryType`` columns and
these numpy kernels run inside Arrow-batched pandas UDFs (north-rule: "ray-casting
over prepared geometries serialized per partition").

Everything here is vectorized numpy over coordinate arrays — no shapely, no per-row
Python in the hot path.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # mean Earth radius

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6

# ---------------------------------------------------------------------------
# WKB codec (little-endian, 2D)
# ---------------------------------------------------------------------------


def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, lon, lat)


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n, 2) float arrays (lon, lat), first = shell, rest = holes."""
    parts = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype="<f8")
        parts.append(struct.pack("<I", len(arr)))
        parts.append(arr.tobytes())
    return b"".join(parts)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    parts = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        parts.append(wkb_polygon(rings))
    return b"".join(parts)


def _read_uint32(buf: bytes, off: int, little: bool) -> tuple[int, int]:
    (v,) = struct.unpack_from("<I" if little else ">I", buf, off)
    return v, off + 4


def _decode_polygon_body(buf: bytes, off: int, little: bool) -> tuple[list[np.ndarray], int]:
    nrings, off = _read_uint32(buf, off, little)
    rings = []
    for _ in range(nrings):
        npts, off = _read_uint32(buf, off, little)
        arr = np.frombuffer(buf, dtype="<f8" if little else ">f8", count=npts * 2, offset=off)
        rings.append(arr.reshape(npts, 2).astype(np.float64))
        off += npts * 16
    return rings, off


def decode_wkb(buf: bytes) -> tuple[int, object]:
    """Decode WKB -> (geom_type, payload).

    payload: point -> (lon, lat); polygon -> [rings]; multipolygon -> [[rings], ...].
    """
    little = buf[0] == 1
    (gtype,) = struct.unpack_from("<I" if little else ">I", buf, 1)
    gtype &= 0xFF  # strip SRID/Z flags if present (we never write them)
    off = 5
    if gtype == _WKB_POINT:
        lon, lat = struct.unpack_from("<dd" if little else ">dd", buf, off)
        return gtype, (lon, lat)
    if gtype == _WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off, little)
        return gtype, rings
    if gtype == _WKB_MULTIPOLYGON:
        npolys, off = _read_uint32(buf, off, little)
        polys = []
        for _ in range(npolys):
            plittle = buf[off] == 1
            off += 5  # byte order + type of each child polygon
            rings, off = _decode_polygon_body(buf, off, plittle)
            polys.append(rings)
        return gtype, polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_rings(buf: bytes) -> list[np.ndarray]:
    """All rings of a polygon/multipolygon as a flat list (even-odd PIP input)."""
    gtype, payload = decode_wkb(buf)
    if gtype == _WKB_POLYGON:
        return payload
    if gtype == _WKB_MULTIPOLYGON:
        return [ring for rings in payload for ring in rings]
    raise ValueError(f"expected (multi)polygon, got type {gtype}")


# ---------------------------------------------------------------------------
# Prepared polygon + vectorized ray-casting PIP
# ---------------------------------------------------------------------------


class PreparedPolygon:
    """Edge arrays + bbox precomputed once; batch PIP over numpy point arrays.

    The per-partition analog of PostGIS's GIST-index + prepared-geometry probe
    (reference O5, database/mass_georef_database.sql:449). Even-odd rule over all
    rings, so holes and multipolygons need no special casing.
    """

    __slots__ = ("x1", "y1", "x2", "y2", "minx", "miny", "maxx", "maxy")

    def __init__(self, rings: list[np.ndarray]):
        xs1, ys1, xs2, ys2 = [], [], [], []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 2:
                continue
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            xs1.append(r[:-1, 0])
            ys1.append(r[:-1, 1])
            xs2.append(r[1:, 0])
            ys2.append(r[1:, 1])
        self.x1 = np.concatenate(xs1) if xs1 else np.empty(0)
        self.y1 = np.concatenate(ys1) if ys1 else np.empty(0)
        self.x2 = np.concatenate(xs2) if xs2 else np.empty(0)
        self.y2 = np.concatenate(ys2) if ys2 else np.empty(0)
        if len(self.x1):
            self.minx = float(min(self.x1.min(), self.x2.min()))
            self.maxx = float(max(self.x1.max(), self.x2.max()))
            self.miny = float(min(self.y1.min(), self.y2.min()))
            self.maxy = float(max(self.y1.max(), self.y2.max()))
        else:
            self.minx = self.miny = math.inf
            self.maxx = self.maxy = -math.inf

    @classmethod
    def from_wkb(cls, buf: bytes) -> "PreparedPolygon":
        return cls(wkb_rings(buf))

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Vectorized even-odd ray cast: (npoints,) bool.

        Crossing rule: edge straddles the horizontal ray (y1 <= y < y2 or
        y2 <= y < y1) and the intersection x is strictly right of the point.
        Boundary behavior follows the half-open convention (deterministic, matches
        the standard PNPOLY algorithm).
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        n = len(lon)
        out = np.zeros(n, dtype=bool)
        if not len(self.x1):
            return out
        cand = (lon >= self.minx) & (lon <= self.maxx) & (lat >= self.miny) & (lat <= self.maxy)
        idx = np.nonzero(cand)[0]
        if not len(idx):
            return out
        px = lon[idx][:, None]  # (p, 1)
        py = lat[idx][:, None]
        x1, y1, x2, y2 = self.x1[None, :], self.y1[None, :], self.x2[None, :], self.y2[None, :]
        straddle = (y1 <= py) != (y2 <= py)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        crossings = (straddle & (px < xint)).sum(axis=1)
        out[idx] = (crossings % 2) == 1
        return out

    def distance_deg(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Euclidean (degree-space) distance from points to the polygon boundary;
        0 for interior points. Used as a refine step / for banding fixtures."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        inside = self.contains(lon, lat)
        px = lon[:, None]
        py = lat[:, None]
        ex, ey = self.x2 - self.x1, self.y2 - self.y1
        seg_len2 = ex * ex + ey * ey
        seg_len2 = np.where(seg_len2 == 0, 1e-300, seg_len2)
        t = ((px - self.x1) * ex + (py - self.y1) * ey) / seg_len2
        t = np.clip(t, 0.0, 1.0)
        dx = px - (self.x1 + t * ex)
        dy = py - (self.y1 + t * ey)
        d = np.sqrt((dx * dx + dy * dy).min(axis=1))
        d[inside] = 0.0
        return d


# ---------------------------------------------------------------------------
# Distances
# ---------------------------------------------------------------------------


def haversine_m(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters (vectorized numpy)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def haversine_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Haversine as a pure JVM Column expression (whole-stage codegen; also
    expressible verbatim in the DuckDB oracle). Same formula as :func:`haversine_m`.
    """
    rlon1, rlat1, rlon2, rlat2 = (F.radians(c) for c in (lon1, lat1, lon2, lat2))
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


# ---------------------------------------------------------------------------
# Convex hull (Andrew monotone chain) — J5 species-range hull
# (reference: ST_ConvexHull(ST_Collect(...)), batch_georeferencing/functions.py:37-42)
# ---------------------------------------------------------------------------


def convex_hull(points: np.ndarray) -> np.ndarray:
    """(n, 2) -> (h, 2) hull vertices in CCW order (closed NOT repeated)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort by (x, y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])

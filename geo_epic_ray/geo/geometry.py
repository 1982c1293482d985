"""Geometry normalizers (M11/S16) — pure numpy, no GEOS.

Reference semantics:
- MultiPolygon -> largest Polygon by area (geoEpic/utils/crop_csb.py:66-75)
- centroid + 'POINT(lon lat)' WKT formatting (geoEpic/soil/fetch_usda.py:48-53)
- km -> degree bbox padding (geoEpic/utils/crop_csb.py:26-27)
"""

from __future__ import annotations

import numpy as np


def ring_area(ring: np.ndarray) -> float:
    """Shoelace area (abs) of a closed ring [(x, y), ...]."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float(abs(np.sum(x * y1 - x1 * y)) / 2.0)


def polygon_area(rings: list[np.ndarray]) -> float:
    """Exterior minus holes."""
    if not rings:
        return 0.0
    return ring_area(rings[0]) - sum(ring_area(r) for r in rings[1:])


def largest_polygon(polygons: list[list[np.ndarray]]) -> list[np.ndarray]:
    """MultiPolygon -> the largest member (crop_csb.py:66-75 rule)."""
    return max(polygons, key=polygon_area)


def polygon_centroid(rings: list[np.ndarray]) -> tuple[float, float]:
    """Area-weighted centroid of the exterior ring (standard formula)."""
    ring = rings[0]
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = np.sum(cross) / 2.0
    if a == 0:
        return float(x.mean()), float(y.mean())
    cx = np.sum((x + x1) * cross) / (6.0 * a)
    cy = np.sum((y + y1) * cross) / (6.0 * a)
    return float(cx), float(cy)


def point_wkt(lon: float, lat: float) -> str:
    """'point(lon lat)' formatting (fetch_usda.py:48-53)."""
    return f"point({lon} {lat})"


def km_to_deg(km: float) -> float:
    """~deg per km at mid-latitudes (crop_csb.py:26-27 uses 1/111.0)."""
    return km / 111.0

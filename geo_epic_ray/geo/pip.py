"""Point-in-polygon: vectorized even-odd ray casting + a cell-bucketed index.

This is the engine's replacement for the reference's site→SSURGO-mukey
assignment, which the reference implements as a nearest-pixel raster lookup
via BallTree (geoEpic/soil/utils.py:5-12, used from
geoEpic/workspace/prepare.py:100-102). The new engine does an exact PIP
join against polygon shards, bucketed by spatial cell so a probe only
tests the handful of polygons whose bbox touches the point's cell —
the distributable analogue of holding the whole soil raster in RAM.

Semantics: even-odd rule; points exactly on an edge are implementation-
defined (fixture points are hash-derived, measure-zero). Holes supported
(any ring crossing counts).
"""

from __future__ import annotations

import numpy as np

from .cells import cell_of, cells_overlapping_bbox


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of points (px=lon, py=lat) vs one closed ring.

    Vectorized over points; loops over edges (polygon vertex counts are
    small compared to batch sizes).
    """
    inside = np.zeros(px.shape[0], dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(x0.shape[0]):
        xa, ya, xb, yb = x0[i], y0[i], x1[i], y1[i]
        if ya == yb:
            continue
        crosses = (ya > py) != (yb > py)
        if not crosses.any():
            continue
        xint = xa + (py - ya) * (xb - xa) / (yb - ya)
        inside ^= crosses & (px < xint)
    return inside


def point_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over all rings (exterior + holes)."""
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    return inside


class PolygonIndex:
    """Cell-bucketed PIP index over a set of simple polygons.

    Built once per actor (``__init__`` of the PIP actor-pool stage) from a
    broadcast polygon table; each query batch tests only the polygons whose
    bbox overlaps the point's cell. ``res`` trades bucket fan-out against
    polygons-per-bucket; pick so a bucket holds O(1..10) polygons.
    """

    def __init__(self, keys: np.ndarray, polygons: list[list[np.ndarray]], res: int = 8):
        self.res = res
        self.keys = np.asarray(keys, dtype=np.int64)
        self.polygons = polygons
        buckets: dict[int, list[int]] = {}
        for i, rings in enumerate(polygons):
            ext = rings[0]
            for c in cells_overlapping_bbox(
                ext[:, 1].min(), ext[:, 1].max(), ext[:, 0].min(), ext[:, 0].max(), res
            ):
                buckets.setdefault(int(c), []).append(i)
        # Deterministic probe order: ascending key within a bucket so that
        # overlapping polygons resolve to the lowest key (engine spec;
        # the reference's raster lookup cannot overlap).
        self.buckets = {
            c: sorted(ix, key=lambda i: (self.keys[i], i)) for c, ix in buckets.items()
        }

    def lookup(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Containing polygon key per point; -1 when none contains it."""
        out = np.full(lat.shape[0], -1, dtype=np.int64)
        cells = cell_of(lat, lon, self.res)
        for c in np.unique(cells):
            sel = np.nonzero(cells == c)[0]
            cand = self.buckets.get(int(c))
            if not cand:
                continue
            unresolved = sel
            for i in cand:
                if unresolved.size == 0:
                    break
                hit = point_in_polygon(lon[unresolved], lat[unresolved], self.polygons[i])
                out[unresolved[hit]] = self.keys[i]
                unresolved = unresolved[~hit]
        return out

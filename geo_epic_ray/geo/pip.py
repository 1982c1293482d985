"""Point-in-polygon: vectorized even-odd ray casting + a cell-bucketed index.

This is the engine's replacement for the reference's site→SSURGO-mukey
assignment, which the reference implements as a nearest-pixel raster lookup
via BallTree (geoEpic/soil/utils.py:5-12, used from
geoEpic/workspace/prepare.py:100-102). The new engine does an exact PIP
join against polygon shards, bucketed by spatial cell so a probe only
tests the handful of polygons whose bbox touches the point's cell —
the distributable analogue of holding the whole soil raster in RAM.

Hot path: candidate (point, polygon) pairs come from a padded
cell→polygon matrix (no per-cell Python loop); pairs are evaluated with
the even-odd rule vectorized over all pairs at once, grouped by polygon
vertex count; overlapping containment resolves to the LOWEST key
(deterministic spec — the reference's raster lookup cannot overlap).

Semantics: even-odd rule; points exactly on a vertical edge fall to the
polygon on their right, on a horizontal edge to the polygon above —
consistent with floor()-grid semantics (verified in tests). Holes
supported (any ring crossing toggles).
"""

from __future__ import annotations

import numpy as np

from .cells import cell_of, cells_overlapping_bbox


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of points (px=lon, py=lat) vs one closed ring."""
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
        # padded cell -> polygon matrix (sorted cell keys for searchsorted)
        self._bkeys = np.array(sorted(buckets), dtype=np.int64)
        maxp = max((len(v) for v in buckets.values()), default=0)
        self._bmat = np.full((self._bkeys.size, maxp), -1, dtype=np.int64)
        for r, c in enumerate(self._bkeys):
            v = buckets[int(c)]
            self._bmat[r, : len(v)] = v
        # group single-ring polygons by vertex count for batched evaluation;
        # polygons with holes take the general per-polygon path
        self._vc_groups: dict[int, np.ndarray] = {}
        self._general: list[int] = []
        by_vc: dict[int, list[int]] = {}
        for i, rings in enumerate(polygons):
            if len(rings) == 1:
                by_vc.setdefault(rings[0].shape[0], []).append(i)
            else:
                self._general.append(i)
        # per-edge CONTIGUOUS 1-D coordinate arrays: the hot loop gathers
        # per-polygon edge coordinates, and strided 2-D gathers are ~an
        # order slower than contiguous 1-D gathers on this kernel (THP
        # faults). Built directly from the per-vc stacks, which are then
        # dropped — keeping both would double per-actor coordinate memory.
        self._edge_xy: dict[int, list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]] = {}
        for vc, ix in by_vc.items():
            stack = np.stack([polygons[i][0] for i in ix])
            self._edge_xy[vc] = [
                (
                    np.ascontiguousarray(stack[:, e, 0]),
                    np.ascontiguousarray(stack[:, e, 1]),
                    np.ascontiguousarray(stack[:, e + 1, 0]),
                    np.ascontiguousarray(stack[:, e + 1, 1]),
                )
                for e in range(vc - 1)
            ]
        for vc, ix in by_vc.items():
            self._vc_groups[vc] = np.asarray(ix, dtype=np.int64)
        # position of polygon i inside its vc stack
        self._pos_in_stack = np.full(len(polygons), -1, dtype=np.int64)
        for vc, ix in self._vc_groups.items():
            self._pos_in_stack[ix] = np.arange(ix.size)
        self._vc_of = np.full(len(polygons), -1, dtype=np.int64)
        for vc, ix in self._vc_groups.items():
            self._vc_of[ix] = vc

    def lookup(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Containing polygon key per point; -1 when none contains it."""
        n = lat.shape[0]
        if n == 0:
            return np.empty(0, dtype=np.int64)
        cells = cell_of(lat, lon, self.res)
        rows = np.searchsorted(self._bkeys, cells)
        rows_ok = (rows < self._bkeys.size) & (
            self._bkeys[np.minimum(rows, self._bkeys.size - 1)] == cells
        )
        # candidate pairs via the padded matrix: K small (bbox overlap count)
        pair_pt: list[np.ndarray] = []
        pair_poly: list[np.ndarray] = []
        rr = np.where(rows_ok, rows, 0)
        for k in range(self._bmat.shape[1]):
            pk = np.where(rows_ok, self._bmat[rr, k], -1)
            sel = np.nonzero(pk >= 0)[0]
            if sel.size:
                pair_pt.append(sel)
                pair_poly.append(pk[sel])
        best = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        if pair_pt:
            ppt = np.concatenate(pair_pt)
            ppo = np.concatenate(pair_poly)
            # batched even-odd per vertex-count group
            for vc, edges in self._edge_xy.items():
                m = self._vc_of[ppo] == vc
                if not m.any():
                    continue
                pts = ppt[m]
                pos = self._pos_in_stack[ppo[m]]
                px, py = lon[pts], lat[pts]
                inside = np.zeros(pts.size, dtype=bool)
                for exa, eya, exb, eyb in edges:
                    xa, ya = exa[pos], eya[pos]
                    xb, yb = exb[pos], eyb[pos]
                    crosses = (ya > py) != (yb > py)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        xint = xa + (py - ya) * (xb - xa) / (yb - ya)
                    inside ^= crosses & (px < xint)
                hit = np.nonzero(inside)[0]
                if hit.size:
                    np.minimum.at(best, pts[hit], self.keys[ppo[m][hit]])
            # general path (holes): per-polygon
            if self._general:
                gset = set(self._general)
                gm = np.array([p in gset for p in ppo])
                for i in np.unique(ppo[gm]):
                    pts = ppt[gm & (ppo == i)]
                    hit = point_in_polygon(lon[pts], lat[pts], self.polygons[i])
                    if hit.any():
                        np.minimum.at(best, pts[hit], np.full(int(hit.sum()), self.keys[i]))
        out = np.where(best == np.iinfo(np.int64).max, -1, best)
        return out
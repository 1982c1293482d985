"""Grid-bucketed exact kNN over a point set (haversine, lowest-id ties).

Replaces the reference's in-RAM BallTree snap of sites to weather-grid
cells (geoEpic/utils/raster_utils.py:16-30 find_nearest;
geoEpic/weather/download_daily.py:128-143). The index buckets reference
points into spatial cells; a query probes its own cell plus an expanding
ring halo, guaranteeing exactness at bucket boundaries: a candidate set is
only accepted once the nearest candidate is closer than the nearest
unexplored ring could be.

Built once per actor in the kNN join stage's ``__init__`` from a broadcast
grid table (ray.put once, not re-shipped per batch).
"""

from __future__ import annotations

import numpy as np

from .extent import LAT0, LAT1, LON0, LON1
from .haversine import haversine_km

_KM_PER_DEG_LAT = 111.19492664455873  # 6371 km * pi / 180


class KnnIndex:
    def __init__(self, gid: np.ndarray, glat: np.ndarray, glon: np.ndarray, res: int = 6):
        order = np.argsort(gid, kind="stable")  # lowest-id-first for tie breaks
        self.gid = np.asarray(gid, dtype=np.int64)[order]
        self.glat = np.asarray(glat, dtype=np.float64)[order]
        self.glon = np.asarray(glon, dtype=np.float64)[order]
        self.n = 1 << res
        self.res = res
        self.dlat = (LAT1 - LAT0) / self.n
        self.dlon = (LON1 - LON0) / self.n
        row = np.clip(((self.glat - LAT0) / self.dlat).astype(np.int64), 0, self.n - 1)
        col = np.clip(((self.glon - LON0) / self.dlon).astype(np.int64), 0, self.n - 1)
        flat = row * self.n + col
        self.buckets: dict[int, np.ndarray] = {
            int(k): np.nonzero(flat == k)[0] for k in np.unique(flat)
        }

    def _candidates(self, row: int, col: int, ring: int) -> np.ndarray:
        """Indices of reference points in the square ring at Chebyshev
        distance ``ring`` around (row, col)."""
        out = []
        for r in range(row - ring, row + ring + 1):
            if not 0 <= r < self.n:
                continue
            cols = (
                range(col - ring, col + ring + 1)
                if r in (row - ring, row + ring)
                else (col - ring, col + ring)
            )
            for c in cols:
                if 0 <= c < self.n:
                    b = self.buckets.get(r * self.n + c)
                    if b is not None:
                        out.append(b)
        if not out:
            return np.empty(0, dtype=np.int64)
        # ascending index == ascending gid (arrays were sorted by gid), so
        # argmin's first-occurrence rule breaks ties to the lowest id.
        return np.sort(np.concatenate(out))

    def query(self, qlat: np.ndarray, qlon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Nearest reference id + distance (km) per query point. Exact."""
        nq = qlat.shape[0]
        out_id = np.full(nq, -1, dtype=np.int64)
        out_d = np.full(nq, np.inf, dtype=np.float64)
        rows = np.clip(((qlat - LAT0) / self.dlat).astype(np.int64), 0, self.n - 1)
        cols = np.clip(((qlon - LON0) / self.dlon).astype(np.int64), 0, self.n - 1)
        flat = rows * self.n + cols
        min_cell_km = min(self.dlat, self.dlon * np.cos(np.radians(LAT1))) * _KM_PER_DEG_LAT
        for cellv in np.unique(flat):
            sel = np.nonzero(flat == cellv)[0]
            row, col = int(cellv) // self.n, int(cellv) % self.n
            cand = np.empty(0, dtype=np.int64)
            best_d = np.full(sel.shape[0], np.inf)
            best_i = np.full(sel.shape[0], -1, dtype=np.int64)
            ring = 0
            while True:
                new = self._candidates(row, col, ring)
                if new.size:
                    d = haversine_km(
                        qlat[sel][:, None],
                        qlon[sel][:, None],
                        self.glat[new][None, :],
                        self.glon[new][None, :],
                    )
                    j = np.argmin(d, axis=1)  # first (lowest-id) min wins
                    dj = d[np.arange(sel.shape[0]), j]
                    upd = dj < best_d
                    # On exact distance ties across rings prefer lowest id:
                    tie = (dj == best_d) & (best_i >= 0) & (new[j] < best_i)
                    upd |= tie
                    best_d = np.where(upd, dj, best_d)
                    best_i = np.where(upd, new[j], best_i)
                    cand = new
                # A result is final when the closest possible point in the
                # next unexplored ring (>= (ring-1) cell widths away, with a
                # conservative km-per-degree floor) is farther than the
                # current best.
                ring += 1
                guaranteed = (ring - 1) * min_cell_km * 0.99
                if (best_i >= 0).all() and (best_d <= guaranteed).all():
                    break
                if ring > 2 * self.n:  # degenerate: empty index region
                    break
            out_id[sel] = np.where(best_i >= 0, self.gid[np.maximum(best_i, 0)], -1)
            out_d[sel] = best_d
        return out_id, out_d

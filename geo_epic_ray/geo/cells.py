"""S2/H3-style hierarchical spatial cells as quadkeys — pure numpy.

Neither the ``h3`` nor ``s2`` libraries exist in this environment, so the
engine uses a Bing-maps-style quadkey over the fixture extent: at
resolution ``r`` the bbox is divided into a 2^r x 2^r lattice and the cell
id interleaves the row/col bits (Morton / Z-order). Prefixes of a quadkey
are its ancestors, exactly like H3/S2 parent cells — which is what the
partitioner needs (hash-partition by cell *prefix*, salt hot prefixes).

Semantics this replaces in the reference: the reference holds whole
rasters/BallTrees in RAM per process (geoEpic/utils/raster_utils.py:165-236)
and never partitions spatially; cell encoding is what makes the joins
distributable.
"""

from __future__ import annotations

import numpy as np

from .extent import LAT0, LAT1, LON0, LON1

MAX_RES = 20


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so there is a 0 bit between each."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def cell_of(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Morton cell id at resolution ``res`` (int64, 0..4^res-1).

    Points outside the extent clip to the border cells.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    n = np.int64(1) << np.int64(res)
    col = np.clip(((lon - LON0) / (LON1 - LON0) * n).astype(np.int64), 0, n - 1)
    row = np.clip(((lat - LAT0) / (LAT1 - LAT0) * n).astype(np.int64), 0, n - 1)
    return (_part1by1(col) | (_part1by1(row) << np.uint64(1))).astype(np.int64)


def parent_cell(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    """Ancestor of a cell: drop 2 bits per resolution step (H3-parent-like)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    return cell >> np.int64(2 * (res - parent_res))


def cell_bounds(cell: int, res: int) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of one cell — for halo logic."""
    n = 1 << res
    col = row = 0
    for i in range(res):
        col |= ((cell >> (2 * i)) & 1) << i
        row |= ((cell >> (2 * i + 1)) & 1) << i
    dlat = (LAT1 - LAT0) / n
    dlon = (LON1 - LON0) / n
    return (LAT0 + row * dlat, LAT0 + (row + 1) * dlat,
            LON0 + col * dlon, LON0 + (col + 1) * dlon)


def cells_overlapping_bbox(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float, res: int
) -> np.ndarray:
    """All cell ids at ``res`` whose rectangle intersects the bbox.

    Used to assign polygons to the cells their bounding box touches, so a
    PIP probe only tests the polygons bucketed under the point's cell.
    """
    n = 1 << res
    dlat = (LAT1 - LAT0) / n
    dlon = (LON1 - LON0) / n
    c0 = max(0, min(n - 1, int(np.floor((lon_min - LON0) / dlon))))
    c1 = max(0, min(n - 1, int(np.floor((lon_max - LON0) / dlon))))
    r0 = max(0, min(n - 1, int(np.floor((lat_min - LAT0) / dlat))))
    r1 = max(0, min(n - 1, int(np.floor((lat_max - LAT0) / dlat))))
    cols = np.arange(c0, c1 + 1, dtype=np.int64)
    rows = np.arange(r0, r1 + 1, dtype=np.int64)
    cc, rr = np.meshgrid(cols, rows)
    return (_part1by1(cc.ravel()) | (_part1by1(rr.ravel()) << np.uint64(1))).astype(
        np.int64
    )

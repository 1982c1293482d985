"""Minimal WKB Polygon encode/decode (pure struct/numpy; no GEOS).

Only what the engine needs: 2-D Polygons, little-endian, exterior ring +
optional holes. The soil side table stores geometry as WKB binary per
FIXTURES.md §2, mirroring how the reference receives SSURGO geometry as
WKT/shapefiles (geoEpic/soil/fetch_usda.py:48-53) — without a GDAL
dependency.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n, 2) float64 arrays [(x=lon, y=lat)]; ring 0 = exterior.

    Rings are closed on encode if the first/last vertex differ.
    """
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if r.ndim != 2 or r.shape[1] != 2 or r.shape[0] < 3:
            raise ValueError("ring must be (n>=3, 2)")
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", r.shape[0]))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def decode_polygon(wkb: bytes) -> list[np.ndarray]:
    """Inverse of :func:`encode_polygon`. Returns the list of closed rings."""
    byte_order, geom_type, n_rings = struct.unpack_from("<BII", wkb, 0)
    if byte_order != 1 or geom_type != _WKB_POLYGON:
        raise ValueError(f"unsupported WKB (order={byte_order}, type={geom_type})")
    off = 9
    rings: list[np.ndarray] = []
    for _ in range(n_rings):
        (npts,) = struct.unpack_from("<I", wkb, off)
        off += 4
        ring = np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=off).reshape(
            npts, 2
        )
        off += npts * 16
        rings.append(ring.copy())
    return rings

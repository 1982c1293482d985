"""Vectorized haversine distance (deg in, km out).

Matches the reference's BallTree metric setup — degrees converted to
radians then haversine (geoEpic/utils/raster_utils.py:21-29).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Pairwise-broadcastable haversine distance in km."""
    p1, l1 = np.radians(lat1), np.radians(lon1)
    p2, l2 = np.radians(lat2), np.radians(lon2)
    dphi = p2 - p1
    dlmb = l2 - l1
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def brute_force_knn(
    qlat: np.ndarray,
    qlon: np.ndarray,
    glat: np.ndarray,
    glon: np.ndarray,
    gid: np.ndarray,
    k: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN by full distance matrix; ties break to the LOWEST id.

    The reference's BallTree tie order is unspecified; this engine's spec is
    lowest-id-wins (documented divergence, SURVEY.md §7.6). Used as the test
    oracle and for small query batches.

    Returns (ids: (n, k), dists_km: (n, k)).
    """
    d = haversine_km(qlat[:, None], qlon[:, None], glat[None, :], glon[None, :])
    order = np.argsort(gid, kind="stable")
    d = d[:, order]
    ids_sorted = gid[order]
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return ids_sorted[idx], np.take_along_axis(d, idx, axis=1)

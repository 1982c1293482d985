"""Affine raster <-> coordinate math and tile assignment — analytic, no GDAL.

Reproduces the reference's pixel-center convention
(geoEpic/utils/raster_utils.py:238-247: shift the transform by half a pixel
and multiply index->coord) and its clip-to-bounds sampling rule
(geoEpic/utils/raster_utils.py:134-136: indices clipped into the raster
before gathering). The tile lattice is never materialized — tile ids are a
pure function of (lat, lon) and the affine transform.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GridTransform:
    """North-up affine grid: coord = origin + index * pixel."""

    lon0: float
    lat0: float
    pixel_deg: float
    width_px: int
    height_px: int

    def pixel_of(self, lat: np.ndarray, lon: np.ndarray, clip: bool = True):
        """Inverse affine + floor -> (px, py). Clips to bounds when asked
        (reference rule raster_utils.py:134-136)."""
        px = np.floor((lon - self.lon0) / self.pixel_deg).astype(np.int64)
        py = np.floor((lat - self.lat0) / self.pixel_deg).astype(np.int64)
        if clip:
            px = np.clip(px, 0, self.width_px - 1)
            py = np.clip(py, 0, self.height_px - 1)
        return px, py

    def center_of(self, px: np.ndarray, py: np.ndarray):
        """Pixel-center coords (half-pixel shift, raster_utils.py:243-245)."""
        lon = self.lon0 + (px + 0.5) * self.pixel_deg
        lat = self.lat0 + (py + 0.5) * self.pixel_deg
        return lat, lon

    def tile_of(self, lat: np.ndarray, lon: np.ndarray, tile_px: int, n_tile_cols: int):
        """tile_id = tile_row * n_tile_cols + tile_col (row-major)."""
        px, py = self.pixel_of(lat, lon, clip=True)
        return (py // tile_px) * n_tile_cols + (px // tile_px)

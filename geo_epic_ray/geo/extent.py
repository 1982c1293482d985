"""Fixture extent + deterministic doc_id -> point derivation.

The extent mirrors the reference template workspace geometry (an
Oklahoma/Kansas-style bbox; cf. the sample site at
/root/reference/geoEpic/assets/ws_template/sites/32620572.sit — lat 38.45,
lon -97.27). Every synthetic table (soil grid, weather lattice, tiles) is
defined over this bbox.

The point derivation is SQL-expressible on purpose: the driver's
correctness gate re-computes it in DuckDB, so it uses only exact int64
modular arithmetic and IEEE-double ops that evaluate identically in numpy
and ANSI SQL:

    h1  = (doc_id * 2654435761) % 2^32          # Knuth multiplicative hash
    lat = LAT0 + (h1 / 2^32) * (LAT1 - LAT0)
    h2  = (doc_id * 2246822519 + 1013904223) % 2^32
    lon = LON0 + (h2 / 2^32) * (LON1 - LON0)

This mirrors the reference's run_info requirement that every site carries
(lat, lon) (reference: geoEpic/core/workspace.py:313-317).
"""

from __future__ import annotations

import numpy as np

# Fixture bbox (degrees, EPSG:4326).
LAT0, LAT1 = 34.5, 39.0
LON0, LON1 = -99.0, -96.0

_M1 = 2654435761  # Knuth 2^32 * golden ratio
_M2 = 2246822519  # xxhash PRIME32_2
_A2 = 1013904223  # Numerical Recipes LCG increment
_TWO32 = 4294967296

# Soil "map-unit" grid (the PIP side table): SOIL_CELL° rectangles.
SOIL_CELL_DEG = 0.15
SOIL_NCOLS = int(round((LON1 - LON0) / SOIL_CELL_DEG))  # 20
SOIL_NROWS = int(round((LAT1 - LAT0) / SOIL_CELL_DEG))  # 30

# Weather lattice (the kNN side table): step in degrees, grid point at
# LAT0 + i*step (reference grid synthesis: geoEpic/weather/download_daily.py:62
# uses 0.00901°; tests use a decimated lattice).
WEATHER_STEP_DEG = 0.05
WEATHER_NCOLS = int(round((LON1 - LON0) / WEATHER_STEP_DEG)) + 1  # 61
WEATHER_NROWS = int(round((LAT1 - LAT0) / WEATHER_STEP_DEG)) + 1  # 91

# CDL-style tile lattice: pixel 0.003°, 256x256-pixel tiles
# (pixel-center math per reference geoEpic/utils/raster_utils.py:238-247).
PIXEL_DEG = 0.003
TILE_PX = 256
TILE_DEG = PIXEL_DEG * TILE_PX  # 0.768
N_TILE_COLS = int(np.ceil((LON1 - LON0) / TILE_DEG))  # 4
N_TILE_ROWS = int(np.ceil((LAT1 - LAT0) / TILE_DEG))  # 6


def doc_point(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lat, lon) per int64 doc_id. Vectorized, SQL-parity.

    >>> lat, lon = doc_point(np.array([0, 1, 2], dtype=np.int64))
    """
    d = doc_id.astype(np.uint64)
    h1 = (d * np.uint64(_M1)) % np.uint64(_TWO32)
    h2 = (d * np.uint64(_M2) + np.uint64(_A2)) % np.uint64(_TWO32)
    lat = LAT0 + (h1.astype(np.float64) / _TWO32) * (LAT1 - LAT0)
    lon = LON0 + (h2.astype(np.float64) / _TWO32) * (LON1 - LON0)
    return lat, lon


def doc_point_sql(doc_id_expr: str = "doc_id") -> tuple[str, str]:
    """ANSI-SQL expressions computing the same (lat, lon) in DuckDB.

    The multiply runs in HUGEINT so it never overflows: for any doc_id,
    (id*M mod 2^128-exact) mod 2^32 equals numpy's uint64 wraparound
    followed by mod 2^32, because 2^32 divides 2^64 (bit-parity
    property-tested in tests/test_sql_parity.py up to 2^40 ids — the
    10^12-corpus range)."""
    big = f"CAST({doc_id_expr} AS HUGEINT)"
    lat = (
        f"({LAT0} + (CAST((({big} * {_M1}) % {_TWO32}) AS DOUBLE) / {_TWO32}.0)"
        f" * ({LAT1} - {LAT0}))"
    )
    lon = (
        f"({LON0} + (CAST((({big} * {_M2} + {_A2}) % {_TWO32}) AS DOUBLE) / {_TWO32}.0)"
        f" * ({LON1} - {LON0}))"
    )
    return lat, lon


def soil_mukey_of(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Oracle mukey for a point: row-major index of its soil grid cell.

    Clipped to the grid bounds (reference clip rule:
    geoEpic/utils/raster_utils.py:134-136). The engine's PIP join must
    reproduce this for points inside the extent.
    """
    col = np.clip(((lon - LON0) / SOIL_CELL_DEG).astype(np.int64), 0, SOIL_NCOLS - 1)
    row = np.clip(((lat - LAT0) / SOIL_CELL_DEG).astype(np.int64), 0, SOIL_NROWS - 1)
    return row * SOIL_NCOLS + col


def weather_grid_of(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Oracle nearest weather lattice point (k=1 haversine).

    On a regular lat/lon lattice the haversine argmin separates per axis
    (distance^2 ~ dlat^2 + (cos(lat)*dlon)^2), so nearest = independent
    round per axis. Matches the reference's BallTree-haversine snap
    (geoEpic/utils/raster_utils.py:16-30; geoEpic/weather/main.py:18-26).
    """
    col = np.clip(
        np.floor((lon - LON0) / WEATHER_STEP_DEG + 0.5).astype(np.int64),
        0,
        WEATHER_NCOLS - 1,
    )
    row = np.clip(
        np.floor((lat - LAT0) / WEATHER_STEP_DEG + 0.5).astype(np.int64),
        0,
        WEATHER_NROWS - 1,
    )
    return row * WEATHER_NCOLS + col


def tile_of(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Oracle tile_id: inverse affine + floor, clipped to lattice bounds."""
    px = np.clip(((lon - LON0) / PIXEL_DEG).astype(np.int64), 0, N_TILE_COLS * TILE_PX - 1)
    py = np.clip(((lat - LAT0) / PIXEL_DEG).astype(np.int64), 0, N_TILE_ROWS * TILE_PX - 1)
    return (py // TILE_PX) * N_TILE_COLS + (px // TILE_PX)

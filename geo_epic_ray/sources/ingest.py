"""Side-table ingest (the documented S8/S10 substitution, closed loop).

The reference reads GDB layers through OGR (geoEpic/utils/misc.py:9-41)
and reprojects rasters through GDAL (raster_utils.py:147-162); neither
library exists in this environment, so the engine's contract is: those
one-time driver-side conversions happen OUTSIDE (ogr2ogr / gdal_translate
to parquet), and THIS module is the ingest gate that validates and
normalizes the exported parquet into the workspace side-table layout the
spatial stages consume (fixtures/soil.SOIL_SCHEMA, weather grid schema,
(px, py, value) raster tables).

Each ingester is a streaming Ray Data pass: schema check up front
(fail fast, driver-side, metadata only), per-batch normalization +
range validation, partitioned parquet out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd


def _rows_written(out_dir: str) -> int:
    """Row count of the just-written parquet from file METADATA only — the
    ingest pipeline executes exactly once (no re-read, no materialize)."""
    import pyarrow.dataset as pds

    return pds.dataset(out_dir, format="parquet").count_rows()


def _require(path: str, needed: set[str]) -> list[str]:
    have = set(pq.read_schema(path).names)
    missing = needed - have
    if missing:
        raise ValueError(f"{path}: missing required columns {sorted(missing)}")
    return sorted(have)


def ingest_soil_table(path: str, out_dir: str) -> int:
    """GDB 'mupolygon'-layer export -> soil side table. Requires
    (mukey, geometry[WKB binary]); passes through albedo/hydgrp/layers
    when present, defaults otherwise. Returns rows written."""
    _require(path, {"mukey", "geometry"})
    ds = rd.read_parquet(path)

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        o = pd.DataFrame({"mukey": b["mukey"].astype("int64")})
        o["geometry"] = b["geometry"]
        o["albedo"] = (
            b["albedo"].astype(float) if "albedo" in b else np.float64(0.15)
        )
        o["hydgrp"] = b["hydgrp"].astype(str) if "hydgrp" in b else "B"
        if "layers" in b:
            o["layers"] = b["layers"]
        bad = ~np.isfinite(o["albedo"]) | (o["albedo"] < 0) | (o["albedo"] > 1)
        if bad.any():
            raise ValueError(f"{int(bad.sum())} rows with albedo outside [0, 1]")
        return o

    out = ds.map_batches(norm, batch_format="pandas")
    out.write_parquet(out_dir)
    return _rows_written(out_dir)


def ingest_weather_grid(path: str, out_dir: str) -> int:
    """Weather-station/grid export -> (grid_id, lat, lon) side table with
    coordinate range validation."""
    _require(path, {"grid_id", "lat", "lon"})
    ds = rd.read_parquet(path, columns=["grid_id", "lat", "lon"])

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        o = pd.DataFrame(
            {
                "grid_id": b.grid_id.astype("int64"),
                "lat": b.lat.astype("float64"),
                "lon": b.lon.astype("float64"),
            }
        )
        bad = (o.lat.abs() > 90) | (o.lon.abs() > 180)
        if bad.any():
            raise ValueError(f"{int(bad.sum())} rows with out-of-range lat/lon")
        return o

    out = ds.map_batches(norm, batch_format="pandas")
    out.write_parquet(out_dir)
    return _rows_written(out_dir)


def ingest_raster_table(
    path: str, out_dir: str, width: int, height: int
) -> int:
    """gdal_translate-style raster export -> (px, py, value) table clipped
    to the declared grid (the engine's raster representation — see
    geo/affine.py GridTransform for the pixel<->coordinate mapping)."""
    _require(path, {"px", "py", "value"})
    ds = rd.read_parquet(path, columns=["px", "py", "value"])

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        o = pd.DataFrame(
            {
                "px": b.px.astype("int64"),
                "py": b.py.astype("int64"),
                "value": b.value.astype("float64"),
            }
        )
        bad = (o.px < 0) | (o.px >= width) | (o.py < 0) | (o.py >= height)
        if bad.any():
            raise ValueError(f"{int(bad.sum())} pixels outside {width}x{height}")
        return o

    out = ds.map_batches(norm, batch_format="pandas")
    out.write_parquet(out_dir)
    return _rows_written(out_dir)


INGESTERS = {
    "soil": ingest_soil_table,
    "weather-grid": ingest_weather_grid,
    "raster": ingest_raster_table,
}

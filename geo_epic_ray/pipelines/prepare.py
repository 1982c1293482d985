"""Workspace preparation pipeline — Ray-Data restatement of
``geo_epic workspace prepare`` (SURVEY.md §3.2; reference
geoEpic/workspace/prepare.py).

reference:  FOI csv/shp -> bbox -> subprocess-dispatched weather download
            -> soil GDB processing -> nearest-pixel soil assignment ->
            info.csv -> `sites generate` writes .sit files in a pool
engine:     one Dataset lineage: sites (from any FOI source) -> soil PIP
            join + weather kNN snap + elevation/slope raster sample ->
            enriched run_info table (+ optional .sit file emission).
            Every subprocess boundary and intermediate CSV disappears.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..geo import extent
from ..geo.affine import GridTransform
from ..stages.spatial import spatial_enrich_fn
from ..stages.zonal import pixel_value
from .flagship import _side_table_refs


def prepare_sites(
    sites: rd.Dataset,
    *,
    elevation_scale: float = 5.0,
    batch_size: int = 16384,
) -> rd.Dataset:
    """FOI/sites Dataset (needs lat, lon; any id columns carried through)
    -> run_info: + mukey (soil PIP), grid_id (weather kNN), tile_id,
    elevation + slope_steep (raster samples, M10: slope_steep =
    round(slope/100, 2) per sites/generate.py:49-76)."""
    soil_ref, grid_ref = _side_table_refs()
    t = GridTransform(
        extent.LON0, extent.LAT0, extent.PIXEL_DEG,
        extent.N_TILE_COLS * extent.TILE_PX, extent.N_TILE_ROWS * extent.TILE_PX,
    )

    def enrich(batch: pa.Table) -> pa.Table:
        out = spatial_enrich_fn(batch, soil_ref=soil_ref, grid_ref=grid_ref)
        lat = out["lat"].to_numpy()
        lon = out["lon"].to_numpy()
        px, py = t.pixel_of(lat, lon, clip=True)
        elevation = 200.0 + pixel_value(px, py) * elevation_scale
        slope = pixel_value(px + 1, py)  # adjacent-pixel 'slope raster'
        return out.append_column("elevation", pa.array(elevation)).append_column(
            "slope_steep", pa.array(np.round(slope / 100.0, 2))
        )

    return sites.map_batches(
        enrich, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def write_sit_files(run_info: rd.Dataset, out_dir: str, id_col: str = "site_id") -> rd.Dataset:
    """Emit one .sit file per site from the enriched table (the reference's
    80-worker writer pool, sites/generate.py:85-104, as a batch stage)."""
    from ..sources.fixed_width import format_sit

    os.makedirs(out_dir, exist_ok=True)

    def write(b: pd.DataFrame) -> pd.DataFrame:
        # one FILE per site is the output format (reference semantics), so
        # per-site open/write is inherent — but the row access is plain
        # array zips, not iterrows (which builds a Series per row)
        paths = []
        for sid, lat, lon, elev, steep in zip(
            b[id_col].to_numpy(), b["lat"].to_numpy(), b["lon"].to_numpy(),
            b["elevation"].to_numpy(), b["slope_steep"].to_numpy(),
        ):
            info = {
                "ID": str(sid), "lat": float(lat), "lon": float(lon),
                "elevation": float(elev),
                "slope_length": 50.0, "slope_steep": float(steep),
            }
            path = os.path.join(out_dir, f"{info['ID']}.sit")
            if not os.path.exists(path):  # M3 existing-output skip
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    f.write(format_sit(info))
                os.replace(tmp, path)
            paths.append(path)
        return pd.DataFrame({id_col: b[id_col], "sit_path": paths})

    return run_info.map_batches(write, batch_format="pandas")

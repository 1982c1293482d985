"""Raster zonal statistics (J4) and point sampling (J3/M10) over an
analytic raster.

Reference semantics:
- sample_raster_nearest (geoEpic/utils/raster_utils.py:111-144): coords ->
  pixel index (clipped to bounds) -> band values gathered per point.
- sample_raster_aggregated (raster_utils.py:53-108): mask the raster by a
  polygon, aggregate the masked pixels (mean/median/mode).

The engine never materializes rasters (SURVEY §2.1 S9): pixel values are
an analytic function of the pixel index, evaluated inside map_batches.
Zonal aggregation parallelizes over PIXEL ROWS (one task range per
stripe), assigns each pixel to its containing polygon with the same PIP
index the doc join uses, and pre-combines per stripe before the tiny
per-polygon merge — the raster-tiles-then-groupby plan from SURVEY §2.4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..geo.affine import GridTransform


def pixel_value(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """The synthetic raster band: deterministic, SQL-expressible."""
    return ((px * 31 + py * 17) % 100).astype(np.float64)


def sample_raster_at_points(
    batch_lat: np.ndarray, batch_lon: np.ndarray, t: GridTransform
) -> np.ndarray:
    """J3: nearest-pixel sample with the clip-to-bounds rule."""
    px, py = t.pixel_of(batch_lat, batch_lon, clip=True)
    return pixel_value(px, py)


def zonal_mean(
    t: GridTransform,
    pip_index,
    *,
    stripe_rows: int = 64,
) -> pd.DataFrame:
    """Mean + count of raster pixels per polygon (pixel centers assigned
    by point-in-polygon). Distributed over pixel-row stripes."""
    n_stripes = (t.height_px + stripe_rows - 1) // stripe_rows
    pip_ref = ray.put(pip_index)

    def stripe(batch: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(pip_ref)
        out = []
        for s in batch["stripe"]:
            y0 = int(s) * stripe_rows
            y1 = min(y0 + stripe_rows, t.height_px)
            py, px = np.mgrid[y0:y1, 0 : t.width_px]
            px, py = px.ravel(), py.ravel()
            lat, lon = t.center_of(px, py)
            keys = idx.lookup(lat, lon)
            vals = pixel_value(px, py)
            ok = keys >= 0
            df = pd.DataFrame({"mukey": keys[ok], "v": vals[ok]})
            g = df.groupby("mukey", as_index=False).agg(
                s=("v", "sum"), n=("v", "size")
            )
            out.append(g)
        return pd.concat(out, ignore_index=True)

    stripes = rd.from_pandas(pd.DataFrame({"stripe": np.arange(n_stripes)}))
    partials = stripes.map_batches(
        stripe, batch_format="pandas", batch_size=4
    ).to_pandas()
    g = partials.groupby("mukey", as_index=False).sum()
    g["mean_value"] = (g.s / g.n).round(6)
    return g.rename(columns={"n": "n_pixels"}).drop(columns=["s"])

"""Weather materialization pipeline — the Ray-Data restatement of
``geo_epic weather download_daily`` (SURVEY.md §3.3; reference
geoEpic/weather/download_daily.py):

reference:  AOI grid → per-cell Daymet fetch + windspeed merge →
            Daily/{id}.DLY + Monthly/{id}.INP files in a process pool
engine:     grid Dataset → batch-parallel synthesis (deterministic — the
            no-network substitute for the REST fetch) → one lineage:
            daily Dataset (+ optional DLY text files) and the A1 monthly
            INP Dataset via groupby(grid_id).map_groups

The site→cell assignment that the reference does with an in-RAM BallTree
(download_daily.py:128-143) is the flagship's kNN join (J2).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..fixtures.weather import weather_daily_table
from ..sources.fixed_width import DLY_COLUMNS, format_dly
from ..stages.climate import monthly_climate_stats


def synthesize_daily(
    grid_ids: np.ndarray, years: tuple[int, ...] = (2019, 2020), seed: int = 42
) -> rd.Dataset:
    """Daily weather Dataset, one block per group of grid cells —
    generation happens inside map_batches, batch-parallel and
    order-independent."""
    ids = rd.from_pandas(pd.DataFrame({"grid_id": np.asarray(grid_ids, dtype=np.int64)}))

    def gen(batch: pa.Table) -> pa.Table:
        return weather_daily_table(
            batch["grid_id"].to_numpy(), years=years, seed=seed
        )

    return ids.map_batches(gen, batch_format="pyarrow", batch_size=8)


def monthly_inp(daily: rd.Dataset) -> rd.Dataset:
    """A1: per-cell monthly INP statistics (the reference computes this
    per-site inside each simulation process, core/model.py:176-178)."""

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        return monthly_climate_stats(g, keep=["grid_id"])

    return daily.groupby("grid_id").map_groups(stats, batch_format="pandas")


def write_dly_files(daily: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Per-cell DLY text files (Daily/{id}.DLY layout,
    download_daily.py:96-102) written from inside the grouped stage —
    distributed, no driver loop."""
    os.makedirs(out_dir, exist_ok=True)

    def write(g: pd.DataFrame) -> pd.DataFrame:
        gid = int(g["grid_id"].iloc[0])
        g = g.sort_values(["year", "month", "day"])
        path = os.path.join(out_dir, f"{gid}.DLY")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(format_dly(g[DLY_COLUMNS]))
        os.replace(tmp, path)
        return pd.DataFrame({"grid_id": [gid], "rows": [len(g)], "path": [path]})

    return daily.groupby("grid_id").map_groups(write, batch_format="pandas")


def merge_windspeed(daily: rd.Dataset, ws: pd.DataFrame, fill: float = 3.5) -> rd.Dataset:
    """J5: exact-date left merge of a windspeed series, missing days
    filled with 3.5 (reference geoEpic/weather/main.py:33-34). The ws
    table is broadcast once."""
    import ray

    ref = ray.put(ws[["date", "ws"]].rename(columns={"ws": "ws_new"}))

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ref)
        b = b.copy()
        b["date"] = pd.to_datetime(b["date"])
        w = w.copy()
        w["date"] = pd.to_datetime(w["date"])
        out = b.merge(w, on="date", how="left")
        out["ws"] = out.pop("ws_new").fillna(fill)
        return out

    return daily.map_batches(merge, batch_format="pandas")

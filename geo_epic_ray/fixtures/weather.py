"""Synthetic weather lattice + daily series (FIXTURES.md §3).

Grid: regular lattice at WEATHER_STEP_DEG over the extent (decimated
version of the reference's 0.00901° grid synthesis,
geoEpic/weather/download_daily.py:62-66).

Daily: smooth deterministic functions of (grid_id, day-of-year) —
sinusoidal seasonality + hash noise — with the reference DLY column set
and physical ranges (geoEpic/io/inputs.py:218, :237-246); zero-inflated
precipitation (~70% dry days) so wet-day transition probabilities are
non-trivial; ws missing on some days with the reference's 3.5 fill
(geoEpic/weather/main.py:34).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.extent import (LAT0, LON0, WEATHER_NCOLS, WEATHER_NROWS,
                          WEATHER_STEP_DEG)
from .rng import uniform

WEATHER_GRID_SCHEMA = pa.schema(
    [("grid_id", pa.int64()), ("lat", pa.float64()), ("lon", pa.float64())]
)

WEATHER_DAILY_SCHEMA = pa.schema(
    [
        ("grid_id", pa.int64()),
        ("date", pa.date32()),
        ("year", pa.int32()),
        ("month", pa.int32()),
        ("day", pa.int32()),
        ("srad", pa.float32()),
        ("tmax", pa.float32()),
        ("tmin", pa.float32()),
        ("prcp", pa.float32()),
        ("rh", pa.float32()),
        ("ws", pa.float32()),
    ]
)


def weather_grid_table() -> pa.Table:
    gid = np.arange(WEATHER_NROWS * WEATHER_NCOLS, dtype=np.int64)
    lat = LAT0 + (gid // WEATHER_NCOLS) * WEATHER_STEP_DEG
    lon = LON0 + (gid % WEATHER_NCOLS) * WEATHER_STEP_DEG
    return pa.Table.from_arrays(
        [pa.array(gid), pa.array(lat), pa.array(lon)], schema=WEATHER_GRID_SCHEMA
    )


def weather_daily_table(
    grid_ids: np.ndarray, years: tuple[int, ...] = (2019, 2020), seed: int = 42
) -> pa.Table:
    """Daily rows for the given grid cells over full calendar years
    (2020 is the leap year of the default pair)."""
    grid_ids = np.asarray(grid_ids, dtype=np.int64)
    dates = np.concatenate(
        [
            np.arange(
                np.datetime64(f"{y}-01-01"), np.datetime64(f"{y + 1}-01-01"),
                np.timedelta64(1, "D"),
            )
            for y in years
        ]
    )
    nd = dates.shape[0]
    g = np.repeat(grid_ids, nd)
    d = np.tile(dates, grid_ids.shape[0])
    doy = (d - d.astype("datetime64[Y]").astype("datetime64[D]")).astype(np.int64) + 1
    key = g * np.int64(100003) + doy + (d.astype("datetime64[Y]").astype(np.int64) + 1970)

    season = np.sin((doy - 105) / 365.0 * 2 * np.pi)
    base_t = 12.0 + 14.0 * season + (g % 17) * 0.3
    tmax = base_t + 6.0 + uniform(key, seed, 40) * 6.0
    tmin = base_t - 6.0 - uniform(key, seed, 41) * 6.0
    srad = np.clip(12.0 + 9.0 * season + uniform(key, seed, 42) * 4.0, 0.01, 900.0)
    wet = uniform(key, seed, 43) < 0.3
    prcp = np.where(wet, uniform(key, seed, 44) * 35.0 + 0.6, 0.0)
    rh = np.clip(0.45 + 0.3 * uniform(key, seed, 45) + 0.1 * season, 0.0, 1.0)
    ws_missing = uniform(key, seed, 46) < 0.05
    ws = np.where(ws_missing, 3.5, uniform(key, seed, 47) * 9.0 + 0.3)

    ymd = d.astype("datetime64[D]")
    year = ymd.astype("datetime64[Y]").astype(np.int64) + 1970
    month = (ymd.astype("datetime64[M]").astype(np.int64) % 12) + 1
    day = (ymd - ymd.astype("datetime64[M]").astype("datetime64[D]")).astype(np.int64) + 1

    return pa.Table.from_arrays(
        [
            pa.array(g),
            pa.array(ymd),
            pa.array(year.astype(np.int32)),
            pa.array(month.astype(np.int32)),
            pa.array(day.astype(np.int32)),
            pa.array(srad.astype(np.float32)),
            pa.array(tmax.astype(np.float32)),
            pa.array(tmin.astype(np.float32)),
            pa.array(prcp.astype(np.float32)),
            pa.array(rh.astype(np.float32)),
            pa.array(ws.astype(np.float32)),
        ],
        schema=WEATHER_DAILY_SCHEMA,
    )

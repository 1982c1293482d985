"""Climate aggregations + scalar formulas.

- ``monthly_climate_stats``: exact reproduction of the reference's
  daily→monthly INP statistics (geoEpic/io/inputs.py:293-319 to_monthly):
  dedup by (year,month,day); groupby month over all years; mean of each
  variable; prcp scaled by fixed days-in-month; std ddof=1; wet-day
  fraction (prcp > 0.5); skew proxy skrf = 3|RMO - median(RMO over the 12
  months)| / sdrf; wet→dry (PRW1) and wet→wet (PRW2) transition rates via
  shifted comparisons in date order; WI = 0. Output column names and order
  follow the reference INP layout.

  Bug-compatible detail: the reference computes
  ``np.sum(np.diff(prcp > 0.5) == -1)`` — but numpy's ``diff`` on a
  boolean array is XOR (True/False), never -1, so the reference's PRW1
  is always exactly 0. Reproduced here deliberately for output parity.
- Scalar climate functions (geoEpic/utils/formule.py:3-34): Magnus-type
  relative humidity from dew point / vapor pressure, wind speed from
  u/v components.
- SSURGO unit conversions (geoEpic/soil/sda.py:166-192).

Run per site/grid cell as ``ds.groupby(key).map_groups(monthly_climate_stats)``
— the reference computes this per-site inside each simulation process
(geoEpic/core/model.py:176-178); here it is one grouped aggregation over
the whole weather table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]

INP_COLUMNS = [
    "OBMX", "OBMN", "SDTMX", "SDTMN", "RMO", "RST2", "RST3",
    "PRW1", "PRW2", "DAYP", "WI", "OBSL", "RH", "UAVO",
]


def monthly_climate_stats(df: pd.DataFrame, *, keep: list[str] | None = None) -> pd.DataFrame:
    """Daily weather rows (year, month, day, srad, tmax, tmin, prcp, rh, ws)
    -> 12 monthly INP rows. ``keep`` columns (e.g. the group key) are
    carried through from the first row."""
    df = df.sort_values(["year", "month", "day"]).drop_duplicates(
        subset=["year", "month", "day"]
    )
    g = df.groupby("month")
    ss = g[["tmax", "tmin", "prcp", "srad", "rh", "ws"]].mean()
    dim = pd.Series(DAYS_IN_MONTH, index=range(1, 13), dtype=float)
    ss["prcp"] = ss["prcp"] * dim.reindex(ss.index)
    ss["sdtmx"] = g["tmax"].std()
    ss["sdtmn"] = g["tmin"].std()
    ss["sdrf"] = g["prcp"].std()
    ss["dayp"] = g.apply(lambda x: (x["prcp"] > 0.5).sum() / len(x), include_groups=False)
    ss["skrf"] = 3 * (ss["prcp"] - ss["prcp"].median()).abs() / ss["sdrf"]
    ss["prw1"] = g.apply(
        lambda x: np.sum(np.diff(x["prcp"] > 0.5) == -1) / len(x), include_groups=False
    )
    ss["prw2"] = g.apply(
        lambda x: np.sum(
            (x["prcp"].fillna(0) > 0.5).shift(fill_value=False)
            & (x["prcp"].fillna(0) > 0.5)
        )
        / len(x),
        include_groups=False,
    )
    ss["wi"] = 0.0
    ss = ss[["tmax", "tmin", "sdtmx", "sdtmn", "prcp", "sdrf", "skrf",
             "prw1", "prw2", "dayp", "wi", "srad", "rh", "ws"]]
    ss.columns = INP_COLUMNS
    out = ss.reset_index()
    if keep:
        for c in keep:
            out[c] = df[c].iloc[0]
    return out


# --- scalar formulas (geoEpic/utils/formule.py, exact constants) ------------


def rh_dewpt(dewpt: np.ndarray, tmax: np.ndarray, tmin: np.ndarray) -> np.ndarray:
    """Relative humidity from dew point (formule.py:3-13):
    exp(17.625 d/(243.04+d)) / exp(17.625 T/(243.04+T)), T = (tmax+tmin)/2."""
    t = (tmax + tmin) / 2
    return np.exp((17.625 * dewpt) / (243.04 + dewpt)) / np.exp(
        (17.625 * t) / (243.04 + t)
    )


def rh_vappr(vappr: np.ndarray, tmax: np.ndarray, tmin: np.ndarray) -> np.ndarray:
    """Relative humidity from vapor pressure in Pa (formule.py:15-27):
    es = 611 exp(17.502 T/(T+240.97)), rh = vp/es."""
    t = (tmax + tmin) / 2
    es = 611.0 * np.exp(17.502 * t / (t + 240.97))
    return vappr / es


def windspd(uw: np.ndarray, vw: np.ndarray) -> np.ndarray:
    """sqrt(u^2 + v^2), rounded to 2 decimals (formule.py:29-34).

    Rounds correctly on the true double (stages/rounding.py), not
    np.round: np.round's float64-scaled tie at e.g. sqrt -> 28.205000...02
    banker's-rounds DOWN where every correctly-rounded implementation
    (CPython round, DuckDB printf) rounds up — a real sf0.1 mismatch."""
    from .rounding import round_decimal

    return round_decimal(np.sqrt(uw**2 + vw**2), 2)


def daymet_normalize(data: pd.DataFrame, start_year: int, end_year: int) -> pd.DataFrame:
    """The Daymet 365-day-calendar normalizer (geoEpic/weather/daymet.py:26-51):
    in leap years shift yday >= 60 by one and insert day 60 as the mean of
    days 59 and 61; srad W/m2 -> MJ/m2/day via daylength; rh from vapor
    pressure. Input columns: year, yday, dayl, prcp, srad, swe, tmax,
    tmin, vp. Output: year, month, day, srad, tmax, tmin, prcp, rh."""
    data = data.copy()
    years = np.arange(start_year, end_year + 1, dtype=np.int64)
    leap = years[((years % 4 == 0) & (years % 100 != 0)) | (years % 400 == 0)]
    sel = data["year"].isin(leap) & (data["yday"] >= 60)
    data.loc[sel, "yday"] += 1
    d59 = data[data["year"].isin(leap) & (data["yday"] == 59)].reset_index(drop=True)
    d61 = data[data["year"].isin(leap) & (data["yday"] == 61)].reset_index(drop=True)
    avg = (d59 + d61) / 2
    avg["year"] = d59["year"]
    avg["yday"] = 60
    data = pd.concat([data, avg]).sort_values(["year", "yday"])
    data["date"] = pd.to_datetime(
        data["year"].astype(int).astype(str) + "-" + data["yday"].astype(int).astype(str),
        format="%Y-%j",
    )
    data["month"] = data["date"].dt.month
    data["day"] = data["date"].dt.day
    data = data.drop(["date", "yday"], axis=1)
    data["srad"] = (data["srad"] * data["dayl"]) / 1e6
    data["rh"] = rh_vappr(data["vp"], data["tmax"], data["tmin"])
    return data[["year", "month", "day", "srad", "tmax", "tmin", "prcp", "rh"]]


# --- SSURGO unit conversions (geoEpic/soil/sda.py:166-192) ------------------

HYDGRP_MAP = {"A": 1, "B": 2, "C": 3, "D": 4}


def ssurgo_unit_convert(df: pd.DataFrame) -> pd.DataFrame:
    """The reference's property conversions: depth cm→m (*0.01), om→oc
    (*0.58), ksat µm/s→mm/h (*3.6), albedo dry→wet (*0.625), coarse
    fragment = 100 - sieve, hydgrp letter→number with 'C' default."""
    out = df.copy()
    if "hzdepb_r" in out:
        out["hzdepb_r"] = out["hzdepb_r"] * 0.01
    if "wfifteenbar_r" in out:
        out["wfifteenbar_r"] = out["wfifteenbar_r"] * 0.01
    if "om_r" in out:
        out["om_r"] = out["om_r"] * 0.58
    if "ksat_r" in out:
        out["ksat_r"] = out["ksat_r"] * 3.6
    if "albedodry_r" in out:
        out["albedodry_r"] = out["albedodry_r"] * 0.625
    if "sieveno10_r" in out:
        out["course_fragment"] = 100.0 - out["sieveno10_r"]
    if "hydgrp" in out:
        out["hydgrp"] = (
            out["hydgrp"].fillna("C").replace("", "C").map(lambda h: HYDGRP_MAP.get(str(h)[0], 3))
        )
    return out

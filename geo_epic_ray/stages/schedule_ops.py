"""Operation-schedule (OPC) transforms — the reference's M9/A6 family,
re-expressed as pure functions over the exploded long schedule table
(one row per operation, keyed by ``opc_id``), designed to run inside
``ds.groupby("opc_id").map_groups(...)``.

Reference semantics (file:line into /root/reference):
- codes: plantation {2,3,4}, harvest {650}, fertilizer 71, winter {10},
  fallow 9                                  (geoEpic/io/opc.py:11-15)
- update/remove                             (geoEpic/io/opc.py:126-201)
- edit_fertilizer_rate: LAST matching row, rate 0 -> 0.2
                                            (geoEpic/io/opc.py:203-220)
- iter_seasons: plantation rows in date order, paired with the first
  harvest of the same crop strictly after   (geoEpic/io/opc.py:246-301)
- update_phu: OPV1 of the plantation row = sum of clip((tmax+tmin)/2 -
  TBS, 0) for plantation_date < d < harvest_date (strict both ends)
                                            (geoEpic/io/opc.py:222-250)
- date edits: stretch mid-season ops linearly by positional index range,
  clamp pre-plant ops into [new_plant-14d, new_plant] and post-harvest
  ops into [new_harvest, new_harvest+14d] with offsets rescaled so the
  max maps to 14 days                       (geoEpic/io/opc.py:365-458,
                                             :460-601)
- append: re-base the second rotation's Yid after the first
                                            (geoEpic/io/opc.py:603-635)
- validate: year continuity, monotonic dates, plant+harvest per crop
                                            (geoEpic/io/opc.py:638-671)

Known reference quirks handled deliberately:
- opc.py:389/:418 call ``Series.ceil()`` which does not exist — the
  reference CRASHES whenever a pre/post-season offset exceeds 14 days.
  This engine uses ``np.ceil`` (the evident intent) and documents the
  divergence.
- opc.py:663 references ``self.fallow_codes`` (undefined; the attribute
  is ``fallow_code``) — the reference crashes on fallow crops. Here
  fallow crops are skipped, the evident intent.
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd

PLANTATION_CODES = [2, 3, 4]
HARVEST_CODES = [650]
FERTILIZER_CODE = 71
WINTER_CROP_CODES = [10]
FALLOW_CODE = 9


def with_dates(df: pd.DataFrame, start_year: int | None = None) -> pd.DataFrame:
    """Add Yr + date columns (opc.py:50-54)."""
    df = df.copy().reset_index(drop=True)
    if start_year is None:
        start_year = int(df["start_year"].iloc[0])
    df["Yr"] = start_year + df["Yid"].astype(int) - 1
    df["date"] = pd.to_datetime(
        df[["Yr", "Mn", "Dy"]].rename(columns={"Yr": "year", "Mn": "month", "Dy": "day"})
    )
    return df


def update_op(df: pd.DataFrame, operation: dict, start_year: int) -> pd.DataFrame:
    """Add or replace an operation (opc.py:126-167)."""
    date = pd.to_datetime(operation["date"])
    df = remove_ops(df, start_year, opID=operation["opID"], date=operation["date"])
    row = {
        "Yid": date.year - start_year + 1,
        "Mn": date.month,
        "Dy": date.day,
        "CODE": operation["opID"],
        "TRAC": operation.get("TRAC", 0),
        "CRP": operation["cropID"],
        "XMTU": operation.get(
            "XMTU",
            operation.get("LYR", operation.get("pestID", operation.get("fertID", 0))),
        ),
    }
    for i in range(1, 9):
        row[f"OPV{i}"] = operation.get(f"OPV{i}", 0)
    for c in df.columns:
        row.setdefault(c, df[c].iloc[0] if len(df) else 0)
    out = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
    return out.sort_values(["Yid", "Mn", "Dy"], kind="stable").reset_index(drop=True)


def remove_ops(
    df: pd.DataFrame,
    start_year: int,
    *,
    opID=None,
    date=None,
    cropID=None,
    XMTU=None,
    fertID=None,
    year=None,
) -> pd.DataFrame:
    """Remove all operations matching every given criterion (opc.py:169-201)."""
    mask = pd.Series(True, index=df.index)
    if date is not None:
        d = pd.to_datetime(date)
        mask &= df["Yid"] == d.year - start_year + 1
        mask &= (df["Mn"] == d.month) & (df["Dy"] == d.day)
    if year is not None:
        mask &= (start_year + df["Yid"] - 1) == year
    if opID is not None:
        mask &= df["CODE"] == opID
    if cropID is not None:
        mask &= df["CRP"] == cropID
    if XMTU is not None:
        mask &= df["XMTU"] == XMTU
    elif fertID is not None:
        mask &= df["XMTU"] == fertID
    return df[~mask].reset_index(drop=True)


def edit_fertilizer_rate(
    df: pd.DataFrame, rate: float, year: int, month=None, day=None
) -> pd.DataFrame:
    """Set OPV1 of the LAST matching fertilizer row; rate 0 -> 0.2
    (opc.py:203-220)."""
    df = with_dates(df)
    cond = (df["CODE"] == FERTILIZER_CODE) & (df["Yr"] == year)
    if month is not None and day is not None:
        cond &= (df["Mn"] == month) & (df["Dy"] == day)
    idx = df.index[cond]
    if len(idx):
        df.loc[idx[-1], "OPV1"] = 0.2 if rate == 0 else rate
    return df.drop(columns=["Yr", "date"])


def iter_seasons(df: pd.DataFrame):
    """Yield growing seasons (opc.py:246-301): plantation rows in date
    order, each paired with the first same-crop harvest strictly after.

    Scale note: the iterrows here (and in _get_date) runs over ONE
    schedule's rows — a few dozen, inherently sequential reference
    semantics. Parallelism lives a level up, across opc_id groups; these
    loops are O(rows-per-schedule), never O(corpus)."""
    df = with_dates(df) if "date" not in df.columns else df
    plant = df[df["CODE"].isin(PLANTATION_CODES)].sort_values("date", kind="stable")
    harv = df[df["CODE"].isin(HARVEST_CODES)].sort_values("date", kind="stable")
    for pidx, prow in plant.iterrows():
        h = harv[(harv["date"] > prow["date"]) & (harv["CRP"] == prow["CRP"])]
        if h.empty:
            continue
        yield {
            "plantation_date": prow["date"],
            "harvest_date": h["date"].iloc[0],
            "crop_code": int(prow["CRP"]),
            "plantation_index": pidx,
            "harvest_index": h.index[0],
        }


def update_phu(
    df: pd.DataFrame, weather: pd.DataFrame, tbs_by_crop: dict[int, float]
) -> pd.DataFrame:
    """OPV1 of each plantation row = seasonal heat units from daily weather
    (opc.py:222-250): sum of clip(0.5*(tmax+tmin) - TBS, 0) strictly
    between plantation and harvest dates."""
    df = with_dates(df)
    w = weather.copy()
    if "date" not in w.columns:
        w["date"] = pd.to_datetime(w[["year", "month", "day"]])
    else:
        w["date"] = pd.to_datetime(w["date"])  # date32 -> Timestamp
    for season in iter_seasons(df):
        tbs = float(tbs_by_crop[season["crop_code"]])
        sel = w[(w["date"] > season["plantation_date"]) & (w["date"] < season["harvest_date"])]
        hu = (0.5 * (sel["tmax"] + sel["tmin"]) - tbs).clip(lower=0)
        df.loc[season["plantation_index"], "OPV1"] = hu.sum()
    return df.drop(columns=["Yr", "date"])


def _get_date(df, year, codes, crop_code=None):
    q = df["CODE"].isin(codes)
    if year is not None:
        q &= df["Yr"] == year
    if crop_code is not None:
        q &= df["CRP"] == crop_code
    out = {}
    for idx, row in df[q].iterrows():
        out[int(row["CRP"])] = {"date": row["date"], "index": idx}
    return out


def _scale_offsets(offsets: pd.Series) -> pd.Series:
    m = offsets.max() or 1
    if m > 14:
        # reference intent; its Series.ceil() call crashes (opc.py:389)
        return np.ceil(offsets / m * 14).astype(int)
    return offsets.astype(int)


def _adjust_pre_planting(df, new_plant_date, crop_code):
    plant = _get_date(df, new_plant_date.year, PLANTATION_CODES, crop_code)
    if crop_code not in plant:
        return df
    old = plant[crop_code]["date"]
    lower = new_plant_date - timedelta(days=14)
    ops = df[(df["Yr"] == new_plant_date.year) & (df["CRP"] == crop_code)]
    cand = ops[(ops["date"] <= old) & (ops["date"] >= lower)]
    if cand.empty:
        return df
    offs = (old - cand["date"]).dt.days
    new_dates = new_plant_date - pd.to_timedelta(_scale_offsets(offs), unit="D")
    df.loc[cand.index, "date"] = new_dates
    df.loc[cand.index, "Mn"] = new_dates.dt.month
    df.loc[cand.index, "Dy"] = new_dates.dt.day
    return df


def _adjust_post_harvest(df, new_harvest_date, crop_code):
    harv = _get_date(df, new_harvest_date.year, HARVEST_CODES, crop_code)
    if crop_code not in harv:
        return df
    old = harv[crop_code]["date"]
    upper = new_harvest_date + timedelta(days=14)
    ops = df[(df["Yr"] == new_harvest_date.year) & (df["CRP"] == crop_code)]
    cand = ops[(ops["date"] >= old) & (ops["date"] <= upper)]
    if cand.empty:
        return df
    offs = (cand["date"] - old).dt.days
    new_dates = new_harvest_date + pd.to_timedelta(_scale_offsets(offs), unit="D")
    df.loc[cand.index, "date"] = new_dates
    df.loc[cand.index, "Mn"] = new_dates.dt.month
    df.loc[cand.index, "Dy"] = new_dates.dt.day
    return df


def _stretch_middle(df, new_plant_date, new_harvest_date, crop_code):
    plant = _get_date(df, new_plant_date.year, PLANTATION_CODES, crop_code)
    harv = _get_date(df, new_harvest_date.year, HARVEST_CODES, crop_code)
    if crop_code not in plant or crop_code not in harv:
        return df
    p0, pi = plant[crop_code]["date"], plant[crop_code]["index"]
    h0, hi = harv[crop_code]["date"], harv[crop_code]["index"]
    orig = (h0 - p0).days
    new = (new_harvest_date - new_plant_date).days
    mid = df[(df.index > pi) & (df.index < hi)]
    if mid.empty or orig == 0:
        return df
    scale = (mid["date"] - p0).dt.days / orig
    nd = pd.Series(
        [new_plant_date + timedelta(days=int(d)) for d in (scale * new).astype(int)],
        index=mid.index,
    )
    # assign in the columns' own dtype (int32 from the fixed-width reader):
    # a bare Python list upcasts and trips pandas' incompatible-dtype
    # FutureWarning (an error in pandas 3)
    df.loc[mid.index, "Mn"] = np.array([d.month for d in nd], dtype=df["Mn"].dtype)
    df.loc[mid.index, "Dy"] = np.array([d.day for d in nd], dtype=df["Dy"].dtype)
    df.loc[mid.index, "date"] = nd
    return df


def edit_plantation_date(df: pd.DataFrame, date, crop_code: int) -> pd.DataFrame:
    """Move a crop's plantation date; mid-season ops stretch linearly,
    pre-plant ops clamp into a 14-day window (opc.py:460-490)."""
    new_plant = pd.to_datetime(date)
    df = with_dates(df)
    plant = _get_date(df, new_plant.year, PLANTATION_CODES, crop_code)
    if crop_code in plant:
        hyear = new_plant.year + 1 if crop_code in WINTER_CROP_CODES else new_plant.year
        harv = _get_date(df, hyear, HARVEST_CODES, crop_code)
        if crop_code in harv:
            df = _stretch_middle(df, new_plant, harv[crop_code]["date"], crop_code)
            df = _adjust_pre_planting(df, new_plant, crop_code)
            df.loc[plant[crop_code]["index"], ["Mn", "Dy"]] = [new_plant.month, new_plant.day]
    return df.drop(columns=["Yr", "date"])


def edit_harvest_date(df: pd.DataFrame, date, crop_code: int) -> pd.DataFrame:
    """Move a crop's harvest date; mid-season ops stretch, post-harvest
    ops clamp into a 14-day window (opc.py:524-555)."""
    new_harv = pd.to_datetime(date)
    df = with_dates(df)
    harv = _get_date(df, new_harv.year, HARVEST_CODES, crop_code)
    if crop_code in harv:
        pyear = new_harv.year - 1 if crop_code in WINTER_CROP_CODES else new_harv.year
        plant = _get_date(df, pyear, PLANTATION_CODES, crop_code)
        if crop_code in plant:
            df = _stretch_middle(df, plant[crop_code]["date"], new_harv, crop_code)
            df = _adjust_post_harvest(df, new_harv, crop_code)
            df.loc[harv[crop_code]["index"], ["Mn", "Dy"]] = [new_harv.month, new_harv.day]
    return df.drop(columns=["Yr", "date"])


def append_rotation(df1: pd.DataFrame, df2: pd.DataFrame) -> pd.DataFrame:
    """Concatenate rotations with Yid re-basing (opc.py:603-635)."""
    last = df1["Yid"].max()
    d2 = df2.copy()
    if d2["Yid"].min() != 0:
        d2["Yid"] -= d2["Yid"].min() - 1
    d2["Yid"] += last
    return pd.concat([df1, d2], ignore_index=True)


def validate_schedule(df: pd.DataFrame, duration: int | None = None) -> tuple[bool, str]:
    """Year continuity + monotonic dates + plant/harvest pairing
    (opc.py:638-671). Returns (is_valid, message) instead of raising —
    matching the workspace validator's log-rows contract
    (geoEpic/core/workspace.py:143-155)."""
    df = with_dates(df)
    duration = int(duration or df["Yid"].max())
    missing = set(range(1, duration + 1)) - set(df["Yid"].astype(int))
    if missing:
        return False, f"Missing the following years: {sorted(missing)}."
    if not df["date"].is_monotonic_increasing:
        return False, "The date is not always increasing."
    for crop in df["CRP"].unique():
        if crop == FALLOW_CODE:
            continue
        cd = df[df["CRP"] == crop]
        if not cd["CODE"].isin(PLANTATION_CODES).any():
            return False, f"Crop {int(crop)} does not have any plantation codes"
        if not cd["CODE"].isin(HARVEST_CODES).any():
            return False, f"Crop {int(crop)} does not have any harvest codes"
    return True, ""


def edit_crop_season(
    df: pd.DataFrame, new_plant, new_harvest, crop_code: int
) -> pd.DataFrame:
    """Move both season endpoints (opc.py:557-601): stretch mid-season ops
    linearly, clamp pre-plant ops into [new_plant-14d, new_plant] and
    post-harvest ops into [new_harvest, new_harvest+14d], then set the
    plantation and harvest rows."""
    new_plant = pd.to_datetime(new_plant)
    new_harvest = pd.to_datetime(new_harvest)
    df = with_dates(df)
    plant = _get_date(df, new_plant.year, PLANTATION_CODES, crop_code)
    harv = _get_date(df, new_harvest.year, HARVEST_CODES, crop_code)
    if crop_code not in plant or crop_code not in harv:
        return df.drop(columns=["Yr", "date"])
    df = _stretch_middle(df, new_plant, new_harvest, crop_code)
    if plant[crop_code]["date"] != new_plant:
        df = _adjust_pre_planting(df, new_plant, crop_code)
        df.loc[plant[crop_code]["index"], ["Mn", "Dy"]] = [new_plant.month, new_plant.day]
    if harv[crop_code]["date"] != new_harvest:
        df = _adjust_post_harvest(df, new_harvest, crop_code)
        df.loc[harv[crop_code]["index"], ["Mn", "Dy"]] = [new_harvest.month, new_harvest.day]
    return df.drop(columns=["Yr", "date"])


def generate_rotation(
    crop_years: pd.DataFrame,
    templates: dict[str, pd.DataFrame],
    mapper: dict[int, str],
    *,
    fallow_name: str = "FALLOW",
) -> tuple[pd.DataFrame, int]:
    """Build a multi-year rotation from year-wise crop data + per-crop
    template rotations (the reference's generate_opc script,
    geoEpic/opc/generate_opc.py:131-201): one template per calendar year
    (FALLOW when the crop code is unmapped or the year is missing),
    appended with Yid re-basing; when planting/harvest dates are given
    for a year, the crop season is edited afterwards.

    ``crop_years``: columns year, crop_code[, planting_date, harvest_date].
    ``templates``: template name -> exploded long OPC DataFrame.
    Returns (rotation, start_year).
    """
    years = range(int(crop_years.year.min()), int(crop_years.year.max()) + 1)
    start_year = int(crop_years.year.min())
    res: pd.DataFrame | None = None
    edits: list[tuple] = []
    for year in years:
        ydata = crop_years[crop_years.year == year]
        if len(ydata):
            code = ydata.iloc[0].crop_code
            name = mapper.get(int(code), fallow_name)
            p = ydata.iloc[0].get("planting_date")
            h = ydata.iloc[0].get("harvest_date")
            if pd.notnull(p) and pd.notnull(h):
                edits.append((pd.to_datetime(p), pd.to_datetime(h), int(code)))
        else:
            name = fallow_name
        t = templates[name].copy()
        res = t if res is None else append_rotation(res, t)
    res = res.reset_index(drop=True)
    res["start_year"] = start_year
    for p, h, code in edits:
        res = edit_crop_season(res, p, h, code)
        res["start_year"] = start_year
    return res.reset_index(drop=True), start_year

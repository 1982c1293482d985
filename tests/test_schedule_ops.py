"""Schedule (OPC) transforms vs hand-computed expectations (M9/A6)."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.fixtures.schedules import schedules_table
from geo_epic_ray.stages import schedule_ops as so


def _one_rotation():
    t = schedules_table(3).to_pandas()
    return t[t.opc_id == "rot-00000"].reset_index(drop=True)


def test_update_replaces_same_op_same_date():
    df = _one_rotation()
    op = {"opID": 71, "cropID": 2, "date": "2018-06-10", "OPV1": 99.0}
    out = so.update_op(df, op, start_year=2018)
    sel = out[(out.CODE == 71) & (out.Mn == 6) & (out.Dy == 10) & (out.Yid == 1)]
    assert len(sel) == 1 and sel.OPV1.iloc[0] == 99.0
    # monotonically sorted by (Yid, Mn, Dy)
    key = out.Yid * 10000 + out.Mn * 100 + out.Dy
    assert key.is_monotonic_increasing


def test_remove_by_code_and_year():
    df = _one_rotation()
    out = so.remove_ops(df, 2018, opID=so.FERTILIZER_CODE, year=2018)
    assert not ((out.CODE == so.FERTILIZER_CODE) & (out.Yid == 1)).any()
    assert ((df.CODE == so.FERTILIZER_CODE) & (df.Yid == 1)).any()


def test_edit_fertilizer_rate_last_row_and_zero_maps_to_02():
    df = _one_rotation()
    yr = 2018
    out = so.edit_fertilizer_rate(df, 0.0, year=yr)
    fert = out[(out.CODE == so.FERTILIZER_CODE) & (out.Yid == 1)]
    assert fert.OPV1.iloc[-1] == 0.2


def test_iter_seasons_pairs_plant_with_next_harvest():
    df = _one_rotation()
    seasons = list(so.iter_seasons(df))
    assert len(seasons) >= 1
    for s in seasons:
        assert s["harvest_date"] > s["plantation_date"]


def test_update_phu_strict_bounds():
    df = _one_rotation()
    seasons = list(so.iter_seasons(df))
    s = seasons[0]
    days = pd.date_range("2018-01-01", "2018-12-31", freq="D")
    w = pd.DataFrame(
        {"year": days.year, "month": days.month, "day": days.day,
         "tmax": 30.0, "tmin": 10.0}
    )
    tbs = {s["crop_code"]: 5.0}
    out = so.update_phu(df, w, tbs)
    n_days = (s["harvest_date"] - s["plantation_date"]).days - 1  # strict both ends
    expected = n_days * (0.5 * (30 + 10) - 5.0)
    got = out.loc[s["plantation_index"], "OPV1"]
    assert got == pytest.approx(expected)


def test_edit_plantation_date_moves_plant_and_clamps_preops():
    df = _one_rotation()
    s = next(so.iter_seasons(df))
    new_date = s["plantation_date"] + pd.Timedelta(days=20)
    out = so.edit_plantation_date(df, new_date, s["crop_code"])
    out_d = so.with_dates(out)
    plant = out_d[(out_d.CODE.isin(so.PLANTATION_CODES)) & (out_d.CRP == s["crop_code"]) & (out_d.Yid == 1)]
    assert plant.Mn.iloc[0] == new_date.month and plant.Dy.iloc[0] == new_date.day


def test_append_rebases_yid():
    a = _one_rotation()
    t = schedules_table(3).to_pandas()
    b = t[t.opc_id == "rot-00001"].reset_index(drop=True)
    out = so.append_rotation(a, b)
    assert out.Yid.max() == a.Yid.max() + b.Yid.max()
    assert set(range(1, int(out.Yid.max()) + 1)) == set(out.Yid.astype(int))


def test_validate_schedule_flags_missing_harvest():
    t = schedules_table(40, invalid_frac=1.0).to_pandas()
    bad = t[t.opc_id == t.opc_id.iloc[0]]
    ok, msg = so.validate_schedule(bad)
    assert not ok and "harvest" in msg
    good = _one_rotation()
    ok, msg = so.validate_schedule(good)
    assert ok


def test_validate_schedule_detects_year_gap():
    df = _one_rotation()
    df2 = df.copy()
    df2["Yid"] = df2["Yid"].replace(1, 3)  # creates a gap if rotation has 1 year
    ok, msg = so.validate_schedule(df2, duration=3)
    assert not ok and "Missing" in msg


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(-40, 40))
def test_edit_plantation_date_properties(shift):
    """Property: after moving the plantation date by any shift, the
    plantation row lands exactly on the requested date, the op count is
    unchanged, and no op of that crop-year moves outside [new_plant-14d,
    old_harvest+1d] on the early side."""
    df = _one_rotation()
    s = next(so.iter_seasons(df))
    new_date = s["plantation_date"] + pd.Timedelta(days=shift)
    out = so.edit_plantation_date(df, new_date, s["crop_code"])
    assert len(out) == len(df)
    od = so.with_dates(out)
    plant = od[(od.CODE.isin(so.PLANTATION_CODES)) & (od.CRP == s["crop_code"])]
    assert plant.Mn.iloc[0] == new_date.month and plant.Dy.iloc[0] == new_date.day
    year_ops = od[(od.CRP == s["crop_code"]) & (od.Yid == 1)]
    assert (year_ops.date >= new_date - pd.Timedelta(days=14)).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 300), st.integers(0, 27))
def test_update_then_remove_is_identity_on_new_op(code_offset, day):
    df = _one_rotation()
    op = {"opID": 900 + code_offset, "cropID": 3,
          "date": f"2018-07-{day + 1:02d}", "OPV1": 1.5}
    added = so.update_op(df, op, start_year=2018)
    assert len(added) == len(df) + 1
    removed = so.remove_ops(added, 2018, opID=op["opID"], date=op["date"])
    a = removed.sort_values(["Yid", "Mn", "Dy", "CODE"]).reset_index(drop=True)
    b = df.sort_values(["Yid", "Mn", "Dy", "CODE"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

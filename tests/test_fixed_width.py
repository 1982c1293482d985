"""Fixed-width format round-trips (S3-S7) incl. a Ray read_binary_files
pipeline over generated files."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.fixtures.schedules import schedules_table
from geo_epic_ray.fixtures.soil import soil_polygons_table
from geo_epic_ray.fixtures.weather import weather_daily_table
from geo_epic_ray.sources import fixed_width as fw


def _dly_df():
    t = weather_daily_table(np.array([0]), years=(2019,)).to_pandas()
    return t[fw.DLY_COLUMNS].copy()


def test_dly_roundtrip():
    df = _dly_df()
    text = fw.format_dly(df)
    back = fw.parse_dly(text)
    assert list(back.columns) == fw.DLY_COLUMNS
    assert len(back) == len(df)
    # values survive at the format's 2-decimal precision
    np.testing.assert_allclose(back["tmax"], df["tmax"].round(2), atol=0.005)
    np.testing.assert_array_equal(back["year"], df["year"])


def test_dly_with_co2_column():
    df = _dly_df()
    df["co2"] = 410.0
    back = fw.parse_dly(fw.format_dly(df))
    assert "co2" in back.columns
    np.testing.assert_allclose(back["co2"], 410.0)


def test_sol_roundtrip():
    soil = soil_polygons_table()
    layers = pd.DataFrame(soil["layers"].to_pylist()[7])
    s = {"soil_id": 7, "albedo": 0.3, "hydgrp": "B", "num_layers": len(layers),
         "layers": layers}
    text = fw.format_sol(s)
    back = fw.parse_sol(text)
    assert back["soil_id"] == 7
    assert back["hydgrp"] == "B"
    assert back["num_layers"] == len(layers)
    np.testing.assert_allclose(
        back["layers"]["pH"], layers.sort_values("Layer_depth")["pH"].round(2), atol=0.005
    )


def test_sit_roundtrip():
    info = {"ID": "32620572", "lat": 38.45, "lon": -97.27, "elevation": 382.0,
            "slope_length": 50.0, "slope_steep": 0.02}
    back = fw.parse_sit(fw.format_sit(info))
    assert back == info


def test_opc_roundtrip():
    t = schedules_table(2).to_pandas()
    rot = t[t.opc_id == "rot-00000"].reset_index(drop=True)
    text = fw.format_opc(rot, start_year=2018, name="rot-00000")
    back, sy = fw.parse_opc(text)
    assert sy == 2018
    assert len(back) == len(rot)
    np.testing.assert_array_equal(back["CODE"], rot["CODE"])
    np.testing.assert_allclose(back["OPV1"], rot["OPV1"].round(3), atol=5e-4)


def test_epic_output_readers():
    acy = "h\n" * 10 + "YR CPNM YLDG\n2020 CORN 9.5\n2021 CORN 10.1\n"
    df = fw.parse_epic_output(acy, "ACY")
    assert list(df.columns) == ["YR", "CPNM", "YLDG"] and len(df) == 2
    dgn = "h\n" * 10 + "Y M D BIOM\n2020 5 1 0.5\n2020 5 2 0.6\n"
    df = fw.parse_epic_output(dgn, "DGN")
    assert "Date" in df.columns and df.Date.iloc[0] == pd.Timestamp("2020-05-01")
    with pytest.raises(ValueError):
        fw.parse_epic_output("h\n" * 10 + "YR CPNM\n", "ACY")


def test_acm_fixed_width():
    # 31 columns (engine fixes the reference's 27-widths/31-names mismatch)
    row = "%5d%5d%5d" % (2020, 1, 2) + "".join("%9.2f" % (i * 1.5) for i in range(28))
    text = (
        "    Y RT#    X" + "".join("%9s" % f"C{i}" for i in range(28)) + "\n" + row + "\n"
    )
    df = fw.parse_epic_output(text, "ACM")
    assert list(df.columns) == fw.ACM_COLUMNS
    assert df["Y"].iloc[0] == 2020 and df["TNO3"].iloc[0] == pytest.approx(27 * 1.5)


def test_ray_pipeline_over_dly_files(ray_session, tmp_path):
    import ray.data as rd

    for gid in range(4):
        df = weather_daily_table(np.array([gid]), years=(2019,)).to_pandas()
        (tmp_path / f"{gid}.DLY").write_text(fw.format_dly(df[fw.DLY_COLUMNS]))
    ds = rd.read_binary_files([str(tmp_path / f"{g}.DLY") for g in range(4)], include_paths=True)
    parsed = ds.map_batches(
        lambda b: fw.parse_many(b, fw.parse_dly), batch_format="pandas"
    )
    out = parsed.to_pandas()
    assert len(out) == 4 * 365
    assert out.source_path.nunique() == 4


def test_dsl_roundtrip():
    dates = pd.to_datetime(["2020-01-01", "2020-01-02", "2020-02-15"])
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"Date": dates})
    for i in range(1, 16):
        df[f"SW{i}"] = rng.uniform(0.05, 0.45, 3).round(4)
    df["SWavg"] = df[[f"SW{i}" for i in range(1, 16)]].mean(axis=1).round(4)
    text = fw.format_dsl(df)
    back = fw.parse_dsl(text)
    assert list(back.columns) == fw.DSL_COLUMNS
    pd.testing.assert_frame_equal(back, df[fw.DSL_COLUMNS], check_exact=False,
                                  rtol=0, atol=1e-9)


def test_dsl_empty_and_block_layout():
    # <= 10 lines -> the reference's empty 17-column frame (sw.py:22-24)
    empty = fw.parse_dsl("short\nfile\n")
    assert list(empty.columns) == fw.DSL_COLUMNS and len(empty) == 0
    # header-only file normalizes to the same empty frame
    assert len(fw.parse_dsl(fw.format_dsl(empty))) == 0
    # the day block is 57 lines with the SW row on line 8 (sw.py:29-31)
    one = pd.DataFrame({"Date": [pd.Timestamp("2021-07-04")],
                        **{f"SW{i}": [0.1 * i] for i in range(1, 16)},
                        "SWavg": [0.8]})
    lines = fw.format_dsl(one).splitlines()
    assert len(lines) == 11 + 57
    assert lines[11].strip().startswith("2021")
    assert len(lines[11 + 7].split()) == 16

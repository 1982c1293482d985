"""Pure-struct shapefile reader/writer (S2) + curve fits + clip (M14/M15)."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.sources.shapefile import (read_dbf, read_shp, shp_to_sites,
                                            write_dbf, write_shp)
from geo_epic_ray.stages.profile_ops import (clip_to_distribution,
                                             double_logistic,
                                             fit_double_logistic, harmonic_fit)


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])


def test_shp_polygon_roundtrip():
    shapes = [
        {"type": 5, "rings": [_sq(-98.0, 36.0, 0.5)]},
        {"type": 5, "rings": [_sq(-97.0, 38.0, 0.25), _sq(-96.9, 38.1, 0.05)]},
    ]
    back = read_shp(write_shp(shapes))
    assert len(back) == 2
    np.testing.assert_allclose(back[0]["rings"][0], shapes[0]["rings"][0])
    assert len(back[1]["rings"]) == 2


def test_shp_point_roundtrip():
    shapes = [{"type": 1, "points": np.array([[-97.27, 38.45]])}]
    back = read_shp(write_shp(shapes))
    np.testing.assert_allclose(back[0]["points"], shapes[0]["points"])


def test_dbf_roundtrip():
    df = pd.DataFrame({"SiteID": [1.0, 2.0], "name": ["alpha", "bravo"], "acct": [1.5, -2.25]})
    back = read_dbf(write_dbf(df))
    np.testing.assert_allclose(back.SiteID, df.SiteID)
    assert list(back.name) == list(df.name)
    np.testing.assert_allclose(back.acct, df.acct)


def test_shp_to_sites_centroids():
    shapes = [{"type": 5, "rings": [_sq(-98.0, 36.0, 0.5)]}]
    dbf = write_dbf(pd.DataFrame({"SiteID": [7.0]}))
    sites = shp_to_sites(write_shp(shapes), dbf)
    assert sites.lat.iloc[0] == pytest.approx(36.25)
    assert sites.lon.iloc[0] == pytest.approx(-97.75)
    assert sites.SiteID.iloc[0] == 7.0


def test_harmonic_fit_recovers_signal():
    t = np.arange(0, 365, 5, dtype=float)
    y = 3.0 + 2.0 * np.cos(2 * np.pi * t / 365) - 1.0 * np.sin(2 * np.pi * t / 365)
    beta, fitted = harmonic_fit(t, y, n_harmonics=1)
    np.testing.assert_allclose(beta, [3.0, 2.0, -1.0], atol=1e-8)
    np.testing.assert_allclose(fitted, y, atol=1e-8)


def test_double_logistic_fit_reasonable():
    t = np.arange(0, 200, 2, dtype=float)
    true = [0.2, 3.0, 60.0, 8.0, 150.0, 10.0]
    y = double_logistic(t, true)
    p = fit_double_logistic(t, y)
    resid = np.sqrt(np.mean((double_logistic(t, p) - y) ** 2))
    assert resid < 0.2  # fits the curve shape well


def test_clip_to_distribution():
    df = pd.DataFrame(
        {"Date": pd.to_datetime(["2020-05-01", "2020-05-02"]), "lai": [9.0, 0.1]}
    )
    ref = pd.DataFrame(
        {"Month_Day": ["05-01", "05-02"], "Min_lai": [1.0, 1.0], "Max_lai": [5.0, 5.0]}
    )
    out = clip_to_distribution(df, ref, "lai")
    assert list(out.lai) == [5.0, 1.0]


def test_config_relative_path_resolution(tmp_path):
    from geo_epic_ray.sources.config import Config

    sub = tmp_path / "ws"
    sub.mkdir()
    cfg_file = sub / "config.yml"
    cfg_file.write_text("model: ./model\nsoil:\n  files_dir: ../soils\nworkers: 40\n")
    cfg = Config(str(cfg_file))
    assert cfg.get("model") == str(sub / "model")
    assert cfg.get("soil")["files_dir"] == str(tmp_path / "soils")
    assert cfg.get("workers") == 40
    cfg.update({"workers": 8})
    assert Config(str(cfg_file)).get("workers") == 8


def test_levenberg_marquardt_recovers_double_logistic_params():
    """curve_fit-parity evidence (VERDICT M14): LM least squares recovers
    the generating parameters of a double-logistic series — noiseless
    exactly, noisy to within the noise floor — and agrees with the
    Nelder-Mead fallback's fitted curve."""
    import numpy as np

    from geo_epic_ray.stages.profile_ops import (double_logistic,
                                                 fit_double_logistic,
                                                 levenberg_marquardt,
                                                 nelder_mead)

    t = np.arange(0, 365, 5, dtype=float)
    true = np.array([0.2, 0.6, 120.0, 12.0, 260.0, 15.0])
    y = double_logistic(t, true)

    x0 = np.array([y.min(), y.max() - y.min(),
                   np.percentile(t, 25), 10.0, np.percentile(t, 75), 10.0])
    p = levenberg_marquardt(double_logistic, t, y, x0)
    np.testing.assert_allclose(p, true, rtol=1e-4)

    rng = np.random.default_rng(3)
    yn = y + 0.005 * rng.standard_normal(y.size)
    pn = levenberg_marquardt(double_logistic, t, yn, x0)
    rmse = np.sqrt(np.mean((double_logistic(t, pn) - y) ** 2))
    assert rmse < 0.01

    # the production entry point picks the better of LM / NM — its curve
    # must track LM's on this series
    pf = fit_double_logistic(t, yn)
    np.testing.assert_allclose(
        double_logistic(t, pf), double_logistic(t, pn), atol=0.02
    )

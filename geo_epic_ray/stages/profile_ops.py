"""Time-series profile operators (M12-M15, A7): outlier clean +
interpolation, Savitzky-Golay / Gaussian smoothing, peak-based season
counting, curve fits, distribution clipping.

scipy is not available in this environment, so the scipy kernels the
reference relies on are reimplemented in numpy with matching semantics:

- remove_outliers_and_interpolate (geoEpic/utils/profile.py:12-76):
  daily reindex; 'median' = |x - rolling_median(win)| > std*factor with
  the reference's window rule (len/7, odd, >=3); 'zscore' = |z| > crit
  (1.6449 @ 0.05 etc., ddof=0 like scipy.stats.zscore); linear interp.
- smooth_series (geoEpic/phenocrop/smooth.py:5-81): 'savitsky' matches
  scipy.signal.savgol_filter mode='interp' (polynomial edge fit);
  'symm_gaussian' matches scipy.ndimage.gaussian_filter1d with
  truncate=4 and reflect padding.
- calc_num_seasons (geoEpic/phenocrop/detect_season.py:6-41): scipy
  find_peaks(height=q75, distance=ceil(n/4)) — local maxima filtered by
  height, then greedy keep-highest under the distance constraint
  (scipy's priority rule).
- clip_to_distribution (geoEpic/utils/profile.py:396-447): per Month_Day
  clamp of the value into [Min_var, Max_var] from a reference table.
- Curve fits (geoEpic/opc/DoubleLogisticCurve.py, AssymetricGaussian.py):
  harmonic fit is exact linear least squares; double-logistic /
  asymmetric-gaussian use a compact Nelder-Mead (no scipy).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_Z_CRIT = {0.01: 2.3263, 0.05: 1.6449, 0.1: 1.2816}


def remove_outliers_and_interpolate(
    df: pd.DataFrame, var: str, method: str = "median",
    user_factor: float = 2, z_pval: float = 0.05,
) -> pd.DataFrame:
    if "Date" not in df.columns or var not in df.columns:
        raise ValueError(f"DataFrame must contain 'Date' and {var} columns.")
    df = df.copy()
    df["Date"] = pd.to_datetime(df["Date"])
    df = df.sort_values("Date").reset_index(drop=True)
    full = pd.date_range(df["Date"].min(), df["Date"].max(), freq="D")
    df = df.set_index("Date").reindex(full).rename_axis("Date").reset_index()

    if method == "median":
        w = int(len(df) / 7) if len(df) > 21 else 3
        w = max(3, w if w % 2 != 0 else w + 1)
        rolling_median = df[var].rolling(window=w, center=True).median()
        cutoff = df[var].std() * user_factor
        outliers = (df[var] - rolling_median).abs() > cutoff
    elif method == "zscore":
        if z_pval not in _Z_CRIT:
            raise ValueError("Invalid z_pval. Use 0.1, 0.05, or 0.01.")
        x = df[var]
        z = (x - x.mean()) / x.std(ddof=0)
        outliers = z.abs() > _Z_CRIT[z_pval]
    else:
        raise ValueError("Unsupported method. Use 'median' or 'zscore'.")

    df.loc[outliers.fillna(False), var] = np.nan
    df[var] = df[var].interpolate(method="linear")
    return df


def savgol(y: np.ndarray, window_length: int, polyorder: int) -> np.ndarray:
    """scipy.signal.savgol_filter(mode='interp') equivalent."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    half = window_length // 2
    # center convolution coefficients from the pseudo-inverse of the
    # Vandermonde matrix over the window offsets
    x = np.arange(-half, half + 1, dtype=np.float64)
    V = np.vander(x, polyorder + 1, increasing=True)
    coeffs = np.linalg.pinv(V)[0]  # evaluates the fit at offset 0
    out = np.convolve(y, coeffs[::-1], mode="same")
    # 'interp' edges: fit a polynomial to the first/last window and
    # evaluate at the edge positions
    if n >= window_length:
        p_head = np.polyfit(np.arange(window_length), y[:window_length], polyorder)
        out[:half] = np.polyval(p_head, np.arange(half))
        p_tail = np.polyfit(np.arange(window_length), y[-window_length:], polyorder)
        out[-half:] = np.polyval(p_tail, np.arange(window_length - half, window_length))
    return out


def gaussian_filter1d(y: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d (mode='reflect') equivalent."""
    y = np.asarray(y, dtype=np.float64)
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    w /= w.sum()
    padded = np.pad(y, radius, mode="symmetric")
    return np.convolve(padded, w[::-1], mode="valid")


def smooth_series(
    df: pd.DataFrame, index_col: str, method: str = "savitsky",
    window_length: int = 3, polyorder: int = 1, sigma: float = 1,
) -> pd.DataFrame:
    """smooth.py:5-81 semantics: sort by date, smooth the non-NaN series,
    write '<col>_smoothed'."""
    if "date" not in df.columns:
        raise ValueError('"date" column not found')
    if index_col not in df.columns:
        raise ValueError(f'"{index_col}" column not found')
    df = df.copy()
    df["date"] = pd.to_datetime(df["date"])
    df = df.sort_values("date")
    series = df[index_col].dropna()
    if len(series) < window_length:
        raise ValueError("series too short for window_length")
    if method == "savitsky":
        if window_length % 2 == 0 or window_length <= 0:
            raise ValueError("window_length must be a positive odd integer")
        if polyorder >= window_length:
            raise ValueError("polyorder must be less than window_length")
        sm = savgol(series.to_numpy(), window_length, polyorder)
    elif method == "symm_gaussian":
        if not 1 <= sigma <= 9:
            raise ValueError("sigma must be between 1 and 9")
        sm = gaussian_filter1d(series.to_numpy(), sigma)
    else:
        raise ValueError("method must be 'savitsky' or 'symm_gaussian'")
    df[f"{index_col}_smoothed"] = pd.Series(sm, index=series.index)
    return df


def find_peaks_simple(y: np.ndarray, height: float, distance: int) -> np.ndarray:
    """scipy.signal.find_peaks(height=, distance=) subset: strict local
    maxima above height, greedily kept highest-first under the distance
    constraint."""
    y = np.asarray(y, dtype=np.float64)
    cand = np.nonzero((y[1:-1] > y[:-2]) & (y[1:-1] > y[2:]))[0] + 1
    cand = cand[y[cand] >= height]
    if cand.size == 0:
        return cand
    order = cand[np.argsort(-y[cand], kind="stable")]
    keep: list[int] = []
    for p in order:
        if all(abs(p - q) >= distance for q in keep):
            keep.append(int(p))
    return np.array(sorted(keep), dtype=np.int64)


def calc_num_seasons(df: pd.DataFrame, index_col: str) -> int:
    """detect_season.py:6-41: peaks above the 75th percentile separated by
    at least ceil(n/4) samples."""
    df = df.copy()
    df["date"] = pd.to_datetime(df["date"])
    df = df.sort_values("date")
    vec = df[index_col].dropna().to_numpy()
    if vec.size == 0:
        return 0
    height = np.nanquantile(vec, q=0.75)
    distance = math.ceil(vec.size / 4)
    return int(find_peaks_simple(vec, height, distance).size)


def clip_to_distribution(
    df: pd.DataFrame, ref: pd.DataFrame, var: str
) -> pd.DataFrame:
    """profile.py:396-447: merge on Month_Day, clamp var into
    [Min_var, Max_var]."""
    df = df.copy()
    df["Month_Day"] = pd.to_datetime(df["Date"]).dt.strftime("%m-%d")
    merged = df.merge(ref, on="Month_Day", how="left")
    lo = merged[f"Min_{var}"].fillna(-np.inf).to_numpy()
    hi = merged[f"Max_{var}"].fillna(np.inf).to_numpy()
    df[var] = np.minimum(np.maximum(df[var].to_numpy(), lo), hi)
    return df.drop(columns=["Month_Day"])


# --- curve fits (M14) -------------------------------------------------------


def harmonic_fit(t: np.ndarray, y: np.ndarray, n_harmonics: int = 2, period: float = 365.0):
    """Least-squares harmonic regression (exact, linear)."""
    t = np.asarray(t, dtype=np.float64)
    cols = [np.ones_like(t)]
    for h in range(1, n_harmonics + 1):
        cols.append(np.cos(2 * np.pi * h * t / period))
        cols.append(np.sin(2 * np.pi * h * t / period))
    X = np.column_stack(cols)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    return beta, X @ beta


def nelder_mead(f, x0, steps=None, max_iter: int = 400, tol: float = 1e-8) -> np.ndarray:
    """Compact Nelder-Mead (standard reflection/expansion/contraction)."""
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.size
    steps = steps if steps is not None else np.where(x0 != 0, 0.1 * np.abs(x0), 0.1)
    simplex = np.vstack([x0] + [x0 + np.eye(n)[i] * steps[i] for i in range(n)])
    fv = np.array([f(x) for x in simplex])
    for _ in range(max_iter):
        order = np.argsort(fv)
        simplex, fv = simplex[order], fv[order]
        if abs(fv[-1] - fv[0]) < tol:
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        if fr < fv[0]:
            xe = centroid + 2 * (centroid - simplex[-1])
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:
                simplex[1:] = simplex[0] + 0.5 * (simplex[1:] - simplex[0])
                fv[1:] = [f(x) for x in simplex[1:]]
    return simplex[np.argmin(fv)]


def levenberg_marquardt(
    model,
    t: np.ndarray,
    y: np.ndarray,
    x0: np.ndarray,
    max_iter: int = 100,
    tol: float = 1e-12,
) -> np.ndarray:
    """Damped least squares with a numeric Jacobian — the same algorithm
    family as the reference's scipy.optimize.curve_fit (LM / trust-region
    least squares, DoubleLogisticCurve.py:7-120), re-implemented in plain
    numpy because scipy is unavailable in this environment. Conformance:
    tests/test_shapefile.py recovers known generating parameters on
    noiseless and noisy double-logistic series."""
    x = np.asarray(x0, dtype=np.float64).copy()
    mask = np.isfinite(np.asarray(y, dtype=np.float64))
    tm, ym = np.asarray(t, dtype=np.float64)[mask], np.asarray(y, dtype=np.float64)[mask]
    if tm.size == 0:
        return x
    r = model(tm, x) - ym
    cost = float(r @ r)
    lam = 1e-3
    for _ in range(max_iter):
        # central-difference Jacobian
        J = np.empty((tm.size, x.size))
        for j in range(x.size):
            h = 1e-6 * max(abs(x[j]), 1.0)
            xp, xm_ = x.copy(), x.copy()
            xp[j] += h
            xm_[j] -= h
            J[:, j] = (model(tm, xp) - model(tm, xm_)) / (2 * h)
        g = J.T @ r
        H = J.T @ J
        d = np.diag(np.clip(np.diag(H), 1e-12, None))
        improved = False
        for _ in range(20):
            try:
                step = np.linalg.solve(H + lam * d, -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            xn = x + step
            rn = model(tm, xn) - ym
            cn = float(rn @ rn)
            if np.isfinite(cn) and cn < cost:
                x, r = xn, rn
                gain = cost - cn
                cost = cn
                lam = max(lam * 0.3, 1e-12)
                improved = True
                break
            lam *= 10
        if not improved or gain < tol * max(cost, 1.0):
            break
    return x


def double_logistic(t, params):
    """DoubleLogisticCurve.py model: base + amp * (1/(1+exp(-(t-s1)/r1))
    - 1/(1+exp(-(t-s2)/r2)))."""
    base, amp, s1, r1, s2, r2 = params
    with np.errstate(over="ignore"):
        return base + amp * (
            1.0 / (1.0 + np.exp(-(t - s1) / max(r1, 1e-6)))
            - 1.0 / (1.0 + np.exp(-(t - s2) / max(r2, 1e-6)))
        )


def fit_double_logistic(t: np.ndarray, y: np.ndarray) -> np.ndarray:
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x0 = np.array(
        [np.nanmin(y), np.nanmax(y) - np.nanmin(y),
         np.nanpercentile(t, 25), 10.0, np.nanpercentile(t, 75), 10.0]
    )

    def loss(p):
        return float(np.nanmean((double_logistic(t, p) - y) ** 2))

    # curve_fit-parity first (LM least squares); the derivative-free
    # Nelder-Mead fallback runs ONLY when LM stalls (fails to halve the
    # initial loss) — not on every call
    p_lm = levenberg_marquardt(double_logistic, t, y, x0)
    l_lm = loss(p_lm)
    if l_lm <= 0.5 * loss(x0):
        return p_lm
    p_nm = nelder_mead(loss, x0)
    return p_lm if l_lm <= loss(p_nm) else p_nm


def asymmetric_gaussian(t, params):
    """AssymetricGaussian.py model: base + amp * exp(-((t-mu)/sig)^2) with
    sig = sig_left left of mu, sig_right right."""
    base, amp, mu, sig_l, sig_r = params
    sig = np.where(t < mu, max(sig_l, 1e-6), max(sig_r, 1e-6))
    return base + amp * np.exp(-(((t - mu) / sig) ** 2))


def fit_asymmetric_gaussian(t: np.ndarray, y: np.ndarray) -> np.ndarray:
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x0 = np.array(
        [np.nanmin(y), np.nanmax(y) - np.nanmin(y), t[np.nanargmax(y)], 30.0, 30.0]
    )

    def loss(p):
        return float(np.nanmean((asymmetric_gaussian(t, p) - y) ** 2))

    p_lm = levenberg_marquardt(asymmetric_gaussian, t, y, x0)
    l_lm = loss(p_lm)
    if l_lm <= 0.5 * loss(x0):  # LM converged — skip the NM fallback
        return p_lm
    p_nm = nelder_mead(loss, x0)
    return p_lm if l_lm <= loss(p_nm) else p_nm

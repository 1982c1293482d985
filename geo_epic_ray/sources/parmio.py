"""Parameter-table parsers (T6): CROPCOM.DAT and ieParm.DAT.

Reference semantics (geoEpic/io/parmio.py):
- CROPCOM: fixed widths [5,5]+[8]*58+[50], 1 skipped title row + header;
  the five split columns (DLAP1 DLAP2 WAC2 PPLP1 PPLP2) are decomposed
  into integer (_v1) and 2-digit-decimal (_v2) parts (parmio.py:25-43).
- ieParm: 30 rows x 2 cols of width 8 (SCRP1/SCRP2 pairs) + 12 rows x 10
  cols (PARM1..PARM120, NaN -> 0), flattened into one wide row
  (parmio.py:139-161).

These tables are driver-side broadcast state in the engine (ray.put once),
matching their calibration role in the reference (core/calibration.py).
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd

CROPCOM_SPLIT_COLUMNS = ["DLAP1", "DLAP2", "WAC2", "PPLP1", "PPLP2"]


def parse_cropcom(text: str) -> pd.DataFrame:
    widths = [5, 5] + [8] * 58 + [50]
    df = pd.read_fwf(io.StringIO(text), widths=widths, skiprows=1)
    for col in CROPCOM_SPLIT_COLUMNS:
        if col not in df.columns:
            continue
        int_col, dec_col = col + "_v1", col + "_v2"
        df[int_col] = np.floor(df[col])
        df[dec_col] = (df[col] - df[int_col]) * 100
        idx = df.columns.get_loc(col)
        df.insert(idx + 1, dec_col, df.pop(dec_col))
        df.insert(idx + 1, int_col, df.pop(int_col))
    return df


def combine_cropcom(df: pd.DataFrame) -> pd.DataFrame:
    """Inverse of the split (parmio.py:36-43)."""
    out = df.copy()
    for col in CROPCOM_SPLIT_COLUMNS:
        int_col, dec_col = col + "_v1", col + "_v2"
        if int_col in out.columns:
            out[col] = out[int_col].astype(int) + out[dec_col] / 100
            out = out.drop(columns=[int_col, dec_col])
    return out


def parse_ieparm(text: str) -> pd.DataFrame:
    parm1 = pd.read_fwf(
        io.StringIO(text), widths=[8, 8], header=None, nrows=30, skip_blank_lines=False
    )
    parm2 = pd.read_fwf(
        io.StringIO(text), widths=[8] * 10, header=None, skiprows=30, nrows=12,
        skip_blank_lines=False,
    )
    p1 = parm1.values.T.ravel()
    p2 = parm2.values.flatten().astype(float)
    p2[np.isnan(p2)] = 0
    data = np.concatenate([p1, p2])
    names = (
        [f"SCRP1_{i}" for i in range(1, 31)]
        + [f"SCRP2_{i}" for i in range(1, 31)]
        + [f"PARM{i}" for i in range(1, 121)]
    )
    return pd.DataFrame([data], columns=names)


def format_ieparm(df: pd.DataFrame) -> str:
    row = df.iloc[0]
    lines = []
    for i in range(1, 31):
        lines.append(f"{row[f'SCRP1_{i}']:8.2f}{row[f'SCRP2_{i}']:8.2f}")
    parms = [row[f"PARM{i}"] for i in range(1, 121)]
    for r in range(12):
        lines.append("".join(f"{v:8.2f}" for v in parms[r * 10 : (r + 1) * 10]))
    return "\n".join(lines) + "\n"

"""Validators (M7/M8) — per-entity checks emitting {id, is_valid, message}
rows, the contract of the reference's Workspace.validate() log table
(geoEpic/core/workspace.py:143-182).

Vectorized restatements of:
- DLY daily weather (geoEpic/io/inputs.py:224-265): dedup by (y,m,d),
  date-range completeness vs the expected calendar, per-column physical
  ranges. Run per grid cell via groupby(grid_id).map_groups.
- SOL soil (geoEpic/io/inputs.py:104-153): albedo/hydgrp/layer-count +
  per-layer ranges (columns where 0 is an accepted sentinel keep the
  reference's "!= 0 and out-of-range" rule).
- SIT site (geoEpic/io/inputs.py:412-440): lat/lon/elevation/slope.
- OPC: stages.schedule_ops.validate_schedule.

The reference returns on the FIRST violation; these validators do too
(same message text for the first failing rule) so conformance tests can
compare messages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DLY_RANGES = {
    "month": (1, 12),
    "day": (1, 31),
    "srad": (0.01, 900),
    "tmin": (-50, 100),
    "tmax": (-50, 100),
    "prcp": (0, 900),
    "rh": (0, 1),
    "ws": (0, 900),
}

# (lo, hi, zero_ok): zero_ok -> the reference accepts exact 0 as "missing"
SOL_LAYER_RULES = [
    ("Layer_depth", 0.01, 10.0, False),
    ("Bulk_Density", 0.5, 2.5, False),
    ("Wilting_capacity", 0.01, 0.5, True),
    ("Field_Capacity", 0.1, 0.9, False),
    ("Sand_content", 1, 99, False),
    ("Silt_content", 1, 99, False),
    ("N_concen", 100, 5000, True),
    ("pH", 3, 9, False),
    ("Sum_Bases", 0, 150, True),
    ("Organic_Carbon", 0.1, 10, True),
    ("Calcium_Carbonate", 0, 99, True),
    ("Cation_exchange", 0, 150, True),
    ("Course_Fragment", 0, 99, True),
    ("cnds", 0.01, 500, True),
    ("pkrz", 0, 20, True),
    ("rsd", 0, 20, True),
    ("Bulk_density_dry", 0, 2.0, True),
    ("psp", 0, 0.9, False),
    ("Saturated_conductivity", 0.00001, 100, True),
]


def validate_dly_group(
    g: pd.DataFrame, start_year: int, end_year: int
) -> pd.DataFrame:
    """One grid cell's daily rows -> one {grid_id, is_valid, message} row."""
    gid = g["grid_id"].iloc[0] if "grid_id" in g.columns else -1
    g = g.drop_duplicates(subset=["year", "month", "day"])
    expected = pd.date_range(f"{start_year}-01-01", f"{end_year}-12-31", freq="D")
    exp = pd.DataFrame(
        {"year": expected.year, "month": expected.month, "day": expected.day}
    )
    merged = exp.merge(g, on=["year", "month", "day"], how="left")
    missing = merged[merged.isnull().any(axis=1)]
    if not missing.empty:
        return pd.DataFrame(
            {"grid_id": [gid], "is_valid": [False],
             "message": [f"Missing rows for {len(missing)} dates"]}
        )
    for col, (lo, hi) in DLY_RANGES.items():
        bad = ~merged[col].between(lo, hi)
        if bad.any():
            return pd.DataFrame(
                {"grid_id": [gid], "is_valid": [False],
                 "message": [f"Values out of range for column '{col}': {int(bad.sum())} rows"]}
            )
    return pd.DataFrame({"grid_id": [gid], "is_valid": [True], "message": [""]})


def validate_sol_row(
    albedo: float, hydgrp: str, layers: list[dict]
) -> tuple[bool, str]:
    """One soil map unit (header + nested layers) -> (is_valid, message)."""
    if not 0 <= albedo <= 1:
        return False, "Albedo should be between 0 and 1."
    if {"A": 1, "B": 2, "C": 3, "D": 4}.get(hydgrp, 3) not in [1, 2, 3, 4]:
        return False, "Hydrological group should be one of 'A', 'B', 'C', or 'D'."
    if not 1 <= len(layers) <= 10:
        return False, "Number of layers should be between 1 and 10."
    for index, row in enumerate(layers):
        for col, lo, hi, zero_ok in SOL_LAYER_RULES:
            v = row[col]
            if zero_ok and v == 0:
                continue
            if not lo <= v <= hi:
                return (
                    False,
                    f"{col} should be between {lo} and {hi}. Found {v} at index {index}.",
                )
    return True, ""


def validate_sol_batch(batch: "pd.DataFrame | pa.Table") -> pd.DataFrame:
    """Vectorized SOL validation over a batch of map units.

    The nested ``layers`` column is flattened ONCE (zero-copy for Arrow
    list<struct> input) and all 19 range rules evaluate as numpy masks
    over the flat arrays; the first-failure-wins cascade (layer-major,
    rule-minor — the reference's loop order) reduces to a per-doc min over
    flat positions. Only docs that actually FAIL take a Python branch (to
    format the reference's exact message, value included) — the all-valid
    hot path is loop-free. The hydgrp rule is omitted: the reference's
    ``dict.get(hydgrp, 3) not in [1,2,3,4]`` can never be true (kept
    verbatim in validate_sol_row for single-row parity)."""
    import pyarrow as pa

    if isinstance(batch, pd.DataFrame):
        tbl = pa.Table.from_pandas(batch, preserve_index=False)
    else:
        tbl = batch
    n = tbl.num_rows
    mukey = tbl["mukey"].to_numpy(zero_copy_only=False)
    albedo = tbl["albedo"].to_numpy(zero_copy_only=False)
    spans = tbl["layers"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    nf = len(flat)

    # per-flat-row first failing rule (reverse iteration: earlier rules win)
    first_rule = np.full(nf, len(SOL_LAYER_RULES), dtype=np.int16)
    cols = {}
    for ri in range(len(SOL_LAYER_RULES) - 1, -1, -1):
        col, lo, hi, zero_ok = SOL_LAYER_RULES[ri]
        v = flat.field(col).to_numpy(zero_copy_only=False)
        cols[col] = v
        bad = ~((v >= lo) & (v <= hi))
        if zero_ok:
            bad &= v != 0
        first_rule[bad] = ri
    fail_pos = np.where(first_rule < len(SOL_LAYER_RULES), np.arange(nf), nf)
    doc_first = np.full(n, nf, dtype=np.int64)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    if starts.size:
        doc_first[nonempty] = np.minimum.reduceat(fail_pos, starts)

    albedo_bad = ~((albedo >= 0) & (albedo <= 1))
    count_bad = ~((counts >= 1) & (counts <= 10))
    layer_bad = doc_first < offsets[1:]  # first failing flat pos in this doc

    msg = np.full(n, "", dtype=object)
    for i in np.nonzero(albedo_bad | count_bad | layer_bad)[0]:
        if albedo_bad[i]:
            msg[i] = "Albedo should be between 0 and 1."
        elif count_bad[i]:
            msg[i] = "Number of layers should be between 1 and 10."
        else:
            p = doc_first[i]
            col, lo, hi, _ = SOL_LAYER_RULES[first_rule[p]]
            msg[i] = (
                f"{col} should be between {lo} and {hi}."
                f" Found {cols[col][p]} at index {p - offsets[i]}."
            )
    return pd.DataFrame({"mukey": mukey, "is_valid": msg == "", "message": msg})


def validate_sit_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized SIT checks; first failing rule wins per row
    (inputs.py:412-440 order)."""
    n = len(batch)
    msg = np.full(n, "", dtype=object)
    rules = [
        (~batch["lat"].between(-90, 90), "Latitude should be between -90 and 90."),
        (~batch["lon"].between(-180, 180), "Longitude should be between -180 and 180."),
        (~batch["elevation"].between(-200, 8000), "Elevation should be between -200 and 8000."),
        (~batch["slope_steep"].between(0, 1), "Slope steepness should be between 0 and 1."),
        (~batch["slope_length"].between(0, 90), "Slope length should be between 0 and 90."),
    ]
    for bad, m in reversed(rules):  # apply in reverse so earlier rules win
        msg[np.asarray(bad)] = m
    return pd.DataFrame(
        {
            "site_id": batch["site_id"] if "site_id" in batch.columns else np.arange(n),
            "is_valid": msg == "",
            "message": msg,
        }
    )

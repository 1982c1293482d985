"""run_info (sites table) reader — S1 (reference geoEpic/core/workspace.py:303-346).

CSV with REQUIRED columns SiteID, soil, opc, dly, lat, lon; extra columns
pass through. The reference also drops sites whose OPC file is missing
(M2) — here that's the semi-join against the schedules table.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

REQUIRED = ["SiteID", "soil", "opc", "dly", "lat", "lon"]


def read_run_info(path: str) -> rd.Dataset:
    ds = rd.read_csv(path)
    cols = set(ds.schema().names)
    missing = [c for c in REQUIRED if c not in cols]
    if missing:
        raise ValueError(f"run_info is missing required columns: {missing}")
    return ds


def filter_opc_present(run_info: rd.Dataset, available_opcs) -> rd.Dataset:
    """M2: keep only sites whose opc exists (semi-join on the opc name);
    the reference warns with the dropped count (workspace.py:331-343)."""
    from ..stages.joins import semi_join

    return semi_join(run_info, set(available_opcs), "opc")

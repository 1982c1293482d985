"""GEE-shaped declarative composite pipeline (S14 / reference
geoEpic/gee/core.py:95-244).

The reference's ``CompositeCollection`` reads a YAML config describing
collections (each with a date range, an optional select mask, and band
formulas), merges them, and per AOI extracts a daily time series:
outer-merge on Date with mean-of-shared-band pairs, daily collapse,
derived-variable formulas, selection of the global variables, dropna and
round(3) (core.py:188-244). No Earth Engine exists here, so a
"collection" is any Dataset of (Date, raw band columns) — the caller
supplies one Dataset per configured collection (synthetic band tables at
gate scale, any tabular source in production) — and every step is a Ray
Data transform:

- date filtering and the select mask are vectorized ``map_batches``
  filters (updateMask's tabular analogue: masked rows drop out of the
  composite, exactly as masked pixels leave GEE's reduceRegion);
- band formulas and derived variables reuse the restricted-namespace
  evaluator (registry.eval_derived_columns's kernel);
- the cross-collection merge is ONE grouped pass: union of the tagged
  collections, groupby(Date), and a pairwise fold in collection order
  that means shared bands (core.py:217-223's suffix-pair mean) after a
  per-collection daily mean (core.py:225's groupby('Date').mean()).

Config schema (dict or YAML text/path):

    global_scope:
      time_range: ["2024-01-01", "2024-12-31"]
      variables: [ndvi, moist, heat]      # final column selection
    collections:
      veg:
        time_range: [...]                 # optional, defaults to global
        select: "nir > 100"               # optional row mask
        variables: {ndvi: "(nir - red) / (nir + red)"}
    derived_variables:                    # optional, post-merge formulas
      stress: "heat * moist"
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .registry import _SAFE_NS


def load_config(config) -> dict:
    """Accept a dict, YAML text, or a YAML file path (reference reads a
    YAML file, core.py:104-106); validate like core.py:83-93."""
    if isinstance(config, str):
        import os

        import yaml

        if os.path.exists(config):
            with open(config) as fh:
                config = yaml.safe_load(fh)
        elif "\n" not in config and config.endswith((".yml", ".yaml")):
            # a path-looking string that doesn't exist is a typo'd path,
            # not inline YAML — fail with the real error
            raise FileNotFoundError(config)
        else:
            config = yaml.safe_load(config)
    if not isinstance(config, dict):
        raise ValueError(
            f"config must be a mapping, got {type(config).__name__} — "
            "a nonexistent file path parsed as inline YAML?"
        )
    if "global_scope" not in config:
        raise ValueError("Missing 'global_scope' in config")
    if "collections" not in config:
        raise ValueError("Missing 'collections' in config")
    for name, c in config["collections"].items():
        if "variables" not in c:
            raise ValueError(f"Missing 'variables' key in collection: {name}")
    return config


def _eval_expr(expr: str, batch: pd.DataFrame) -> np.ndarray:
    ns = dict(_SAFE_NS)
    ns.update({c: batch[c].to_numpy() for c in batch.columns})
    return eval(expr, {"__builtins__": {}}, ns)  # noqa: S307


def composite_extract(
    config, sources: dict[str, rd.Dataset], date_col: str = "Date"
) -> rd.Dataset:
    """Run the declarative composite over per-collection band Datasets.

    Returns a Dataset of (Date, *global variables), daily, sorted by
    Date downstream of a single grouped shuffle; rows with any null
    selected variable are dropped and values rounded to 3 decimals
    (core.py:237-243)."""
    config = load_config(config)
    gscope = config["global_scope"]
    g_start, g_end = gscope["time_range"]
    out_vars = list(gscope["variables"])
    derived = config.get("derived_variables") or {}
    coll_names = list(config["collections"])
    coll_vars: dict[str, list[str]] = {}

    tagged = []
    for ci, name in enumerate(coll_names):
        cfg = config["collections"][name]
        if name not in sources:
            raise ValueError(f"no source Dataset supplied for collection {name!r}")
        start, end = cfg.get("time_range", (g_start, g_end))
        lo, hi = pd.Timestamp(start), pd.Timestamp(end)
        mask_expr = cfg.get("select")
        formulas = dict(cfg["variables"])
        coll_vars[name] = list(formulas)

        def stage(batch: pd.DataFrame, *, _lo=lo, _hi=hi, _mask=mask_expr,
                  _formulas=formulas, _ci=ci, _vars=tuple(formulas)) -> pd.DataFrame:
            d = pd.to_datetime(batch[date_col])
            batch = batch[(d >= _lo) & (d <= _hi)]
            if _mask and len(batch):
                keep = np.asarray(_eval_expr(_mask, batch), dtype=bool)
                batch = batch[keep]
            batch = batch.copy()
            for var, expr in _formulas.items():
                batch[var] = _eval_expr(expr, batch) if len(batch) else np.empty(0)
            out = batch[[date_col] + list(_vars)].copy()
            out["__coll"] = np.int64(_ci)
            return out

        tagged.append(sources[name].map_batches(stage, batch_format="pandas"))

    u = tagged[0]
    for t in tagged[1:]:
        u = u.union(t)

    all_vars: list[str] = []
    for name in coll_names:
        for v in coll_vars[name]:
            if v not in all_vars:
                all_vars.append(v)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # per-collection daily mean, then pairwise fold in collection
        # order: shared bands average (the reference's _x/_y pair mean)
        acc: dict[str, float] = {}
        for ci in sorted(g["__coll"].unique()):
            rows = g[g["__coll"] == ci]
            for v in all_vars:
                if v not in rows.columns:
                    continue
                col = rows[v].dropna()
                if not len(col):
                    continue
                val = float(col.mean())
                acc[v] = val if v not in acc or np.isnan(acc[v]) else (acc[v] + val) / 2.0
        row = {date_col: [g[date_col].iloc[0]]}
        row.update({v: [acc.get(v, np.nan)] for v in all_vars})
        return pd.DataFrame(row)

    from ..stages import exchange

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [fold(sub) for _, sub in g.groupby(date_col, sort=False)],
            ignore_index=True,
        )

    date_bucket = exchange.key_cols_bucket_fn([date_col], 16)

    empty = pd.DataFrame(
        {date_col: pd.Series([], dtype=object),
         **{v: pd.Series([], dtype=float) for v in all_vars}}
    )
    merged = exchange.group_map(
        exchange.scatter(u, 16, date_bucket), fold_bucket, empty
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        for var, expr in derived.items():
            b[var] = _eval_expr(expr, b) if len(b) else np.empty(0)
        out = b[[date_col] + out_vars].dropna().copy()
        out[date_col] = pd.to_datetime(out[date_col])
        for c in out_vars:
            out[c] = out[c].astype(float).round(3)
        return out

    return merged.map_batches(finish, batch_format="pandas")

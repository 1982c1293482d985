"""User-extension surface (§2.10): per-record routines, objectives,
plugin loading, and a safe YAML-style derived-column evaluator.

Reference semantics re-expressed Ray-Data-first:
- ``@routine`` mirrors ``@workspace.logger`` (geoEpic/core/workspace.py:94-114):
  a user function receiving one record dict and returning a dict of
  outputs; the engine runs ALL registered routines inside one vectorized
  ``map_batches`` pass and emits one output table per routine name —
  no Redis/SQLite side-channel, results are just Datasets.
- ``@objective`` mirrors ``@workspace.objective`` (workspace.py:116-129):
  a driver-side reduction over a materialized (small) result.
- ``import_function("path.py fn")`` (geoEpic/utils/misc.py:97-133): load a
  plugin callable from a file path.
- ``eval_derived_columns``: the GEE YAML formula idea
  (geoEpic/gee/core.py:122-155 evaluates numpy-only band expressions) —
  arithmetic over batch columns with a restricted eval namespace
  (numpy + the batch's columns, no builtins).
"""

from __future__ import annotations

import importlib.util
import sys
from collections.abc import Callable

import numpy as np
import pandas as pd
import ray.data as rd


class RoutineRegistry:
    def __init__(self):
        self.routines: dict[str, Callable[[dict], dict]] = {}
        self.batch_routines: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {}
        self.objectives: dict[str, Callable] = {}

    def routine(self, fn: Callable[[dict], dict]) -> Callable:
        """Register a per-record post-process routine (@workspace.logger).
        The per-record dict API mirrors the reference; it costs a Python
        loop per row — prefer ``@batch_routine`` for anything hot."""
        self.routines[fn.__name__] = fn
        return fn

    def batch_routine(
        self, fn: Callable[[pd.DataFrame], pd.DataFrame]
    ) -> Callable:
        """Register a VECTORIZED routine: receives the whole batch
        (pandas) and returns a DataFrame of outputs, one row per input
        record, WITHOUT the id column (the engine attaches id + routine
        name). This is the scale surface — no to_dict('records') row
        loop; the per-record ``@routine`` API is kept for reference
        parity only."""
        self.batch_routines[fn.__name__] = fn
        return fn

    def objective(self, fn: Callable) -> Callable:
        self.objectives[fn.__name__] = fn
        return fn

    def apply(self, ds: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
        """Run every registered routine over each record; output one row
        per (record, routine) with the routine's dict flattened —
        the engine's version of the reference's per-site log tables.
        Batch routines run vectorized (one call per batch); per-record
        routines pay the row loop their API implies."""
        routines = dict(self.routines)
        batch_routines = dict(self.batch_routines)

        def run(batch: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for name, fn in batch_routines.items():
                out = fn(batch).reset_index(drop=True)
                out.insert(0, "routine", name)
                out.insert(0, id_col, batch[id_col].to_numpy())
                frames.append(out)
            rows = []
            if routines:
                for rec in batch.to_dict("records"):
                    for name, fn in routines.items():
                        out = fn(rec)
                        rows.append({id_col: rec[id_col], "routine": name, **out})
            if rows:
                frames.append(pd.DataFrame(rows))
            if not frames:
                return pd.DataFrame({id_col: [], "routine": []})
            return pd.concat(frames, ignore_index=True)

        return ds.map_batches(run, batch_format="pandas")

    def reduce(self, name: str, df: pd.DataFrame):
        """Driver-side objective over a materialized small result."""
        return self.objectives[name](df)


def import_function(spec: str) -> Callable:
    """'path/to/module.py function_name' -> callable (misc.py:97-133)."""
    path, fn_name = spec.rsplit(" ", 1)
    spec_obj = importlib.util.spec_from_file_location("_user_plugin", path)
    module = importlib.util.module_from_spec(spec_obj)
    sys.modules["_user_plugin"] = module
    spec_obj.loader.exec_module(module)
    return getattr(module, fn_name)


_SAFE_NS = {
    "np": np, "abs": np.abs, "sqrt": np.sqrt, "exp": np.exp, "log": np.log,
    "minimum": np.minimum, "maximum": np.maximum, "where": np.where,
}


def eval_derived_columns(
    ds: rd.Dataset, formulas: dict[str, str]
) -> rd.Dataset:
    """Add derived columns from declarative expressions, e.g.
    {"ndvi": "(nir - red) / (nir + red)"} — columns resolve to the batch's
    columns; only numpy callables are in scope (no builtins)."""

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        ns = dict(_SAFE_NS)
        ns.update({c: batch[c].to_numpy() for c in batch.columns})
        for name, expr in formulas.items():
            batch[name] = eval(expr, {"__builtins__": {}}, ns)  # noqa: S307
        return batch

    return ds.map_batches(apply, batch_format="pandas")

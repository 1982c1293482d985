"""Error quarantine: skip-and-report semantics for per-row failures.

The reference collects ``failed_indices`` per pool and continues without
retry (geoEpic/utils/parallel.py:76-89). The engine's version wraps any
per-batch transform so that a failing batch is retried row-by-row: rows
that succeed flow on, rows that fail carry ``error`` and go to a
quarantine output instead of poisoning the whole block — Ray's task
retries handle worker loss, this handles bad DATA.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import ray.data as rd


def with_quarantine(fn: Callable[[pd.DataFrame], pd.DataFrame]):
    """Wrap a pandas batch transform: on batch failure, fall back to
    per-row application; failed rows get error=<msg> and null outputs."""

    def wrapped(batch: pd.DataFrame) -> pd.DataFrame:
        try:
            out = fn(batch)
            out["error"] = ""
            return out
        except Exception:  # noqa: BLE001 — isolate the failing rows
            frames = []
            for i in range(len(batch)):
                row = batch.iloc[i : i + 1]
                try:
                    r = fn(row)
                    r["error"] = ""
                except Exception as e:  # noqa: BLE001
                    r = row.copy()
                    r["error"] = f"{type(e).__name__}: {e}"
                frames.append(r)
            return pd.concat(frames, ignore_index=True)

    return wrapped


def split_quarantine(ds: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """(clean rows, quarantined rows) from a with_quarantine output."""
    ok = ds.map_batches(lambda b: b[b["error"] == ""], batch_format="pandas")
    bad = ds.map_batches(lambda b: b[b["error"] != ""], batch_format="pandas")
    return ok, bad

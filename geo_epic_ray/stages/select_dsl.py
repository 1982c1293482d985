"""The reference's site-selection DSL, Ray-Data-native (M1).

Reference semantics (geoEpic/utils/misc.py:44-93 filter_dataframe):

- ``Range(a, b)``  — positional slice by fraction of the (ordered) input
- ``Random(f)``    — sample a fraction
- anything else    — ``df.query(expr)`` row filter
- ``;``            — AND-chain of selections
- ``+``            — union of two selections, dedup on the id column with
                     ``keep='last'`` (later branch wins)

Engine restatement, distributable and deterministic:

- Input order for ``Range`` is ascending ``id_col`` (the reference depends
  on CSV row order, which is not reproducible under parallel reads; the
  engine's spec is id order — documented divergence). Implemented with
  ``sort`` + ``split_at_indices`` so the slice is positional and exact.
- ``Random(f)`` uses a multiplicative-hash rule on the id
  ((id * 2654435761 + 40503) % 2^32 < f * 2^32) instead of an RNG, so it
  is reproducible AND SQL-expressible for the oracle gate.
- ``keep='last'`` dedup = max branch priority per id (order-insensitive
  restatement of pandas drop_duplicates(keep='last')).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_RANGE = re.compile(r"^\s*Range\(\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\)\s*$")
_RANDOM = re.compile(r"^\s*Random\(\s*([0-9.]+)\s*\)\s*$")

_SAMPLE_MULT = 2654435761
_SAMPLE_ADD = 40503
_TWO32 = 4294967296


def sample_mask(ids: np.ndarray, fraction: float) -> np.ndarray:
    """Deterministic hash-sample membership (SQL parity — see module doc)."""
    h = (ids.astype(np.uint64) * np.uint64(_SAMPLE_MULT) + np.uint64(_SAMPLE_ADD)) % np.uint64(_TWO32)
    return h < np.uint64(int(fraction * _TWO32))


def sample_sql(id_expr: str, fraction: float) -> str:
    return (
        f"((CAST({id_expr} AS HUGEINT) * {_SAMPLE_MULT} + {_SAMPLE_ADD})"
        f" % {_TWO32}) < {int(fraction * _TWO32)}"
    )


def _apply_one(ds: rd.Dataset, term: str, id_col: str) -> rd.Dataset:
    m = _RANGE.match(term)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        n = ds.count()
        a, b = int(lo * n), int(hi * n)
        parts = ds.sort(id_col).split_at_indices([a, b])
        return parts[1]
    m = _RANDOM.match(term)
    if m:
        f = float(m.group(1))

        def keep(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(sample_mask(ids, f)))

        return ds.map_batches(keep, batch_format="pyarrow")

    def query(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.query(term)

    return ds.map_batches(query, batch_format="pandas")


def _branch_mask_fn(expr: str, id_col: str):
    """Compile a ';' chain of Random/query terms into one vectorized
    per-batch boolean-mask function; None if the chain needs global state
    (Range) or nests another '+'."""
    if "+" in expr:
        return None
    terms = [t.strip() for t in expr.split(";") if t.strip()]
    if any(_RANGE.match(t) for t in terms):
        return None

    def mask(batch: pd.DataFrame) -> np.ndarray:
        m = np.ones(len(batch), dtype=bool)
        for term in terms:
            r = _RANDOM.match(term)
            if r:
                ids = batch[id_col].to_numpy().astype(np.int64)
                m &= sample_mask(ids, float(r.group(1)))
            else:
                m &= np.asarray(batch.eval(term), dtype=bool)
        return m

    return mask


def select(ds: rd.Dataset, expr: str, id_col: str) -> rd.Dataset:
    """Full DSL: ';' AND-chains, one optional top-level '+' union."""
    if "+" in expr:
        left, right = expr.split("+", 1)
        # '+' branches are pure SELECTIONS of the same rows, so the
        # keep-last dedup degenerates to an OR of the membership masks —
        # when both branches are per-batch-maskable (no Range), fuse to a
        # SINGLE scan with no union and no dedup shuffle.
        lm = _branch_mask_fn(left.strip(), id_col)
        rm = _branch_mask_fn(right.strip(), id_col)
        if lm is not None and rm is not None:

            def keep_either(batch: pd.DataFrame) -> pd.DataFrame:
                return batch[lm(batch) | rm(batch)]

            return ds.map_batches(keep_either, batch_format="pandas")
        a = select(ds, left.strip(), id_col)
        b = select(ds, right.strip(), id_col)

        def tag(priority: int):
            def f(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "__branch", pa.array(np.full(batch.num_rows, priority, dtype=np.int64))
                )

            return f

        u = a.map_batches(tag(0), batch_format="pyarrow").union(
            b.map_batches(tag(1), batch_format="pyarrow")
        )

        # keep='last' == max branch priority per id; bucketed by hash(id)
        # so the dedup is a vectorized pandas pass per bucket instead of a
        # per-id map_groups (which pays per-group overhead at scale)
        def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__bucket"] = (
                pd.util.hash_array(batch[id_col].to_numpy()) % 64
            ).astype("int64")
            return batch

        def keep_last(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("__branch", kind="stable").drop_duplicates(
                id_col, keep="last"
            )
            return g.drop(columns=["__branch", "__bucket"])

        return (
            u.map_batches(bucketize, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(keep_last, batch_format="pandas")
        )
    out = ds
    for term in expr.split(";"):
        term = term.strip()
        if term:
            out = _apply_one(out, term, id_col)
    return out

"""Join/lookup stages: broadcast hash / semi / anti joins, grouped argmax.

Reference joins are all driver-side pandas merges (SURVEY.md §2.4); at
scale the small side is broadcast once (``ray.put``) and probed inside
``map_batches`` — no shuffle. Grouped argmax (dominant component,
geoEpic/soil/ssurgo_gdb.py:57) is a ``groupby().map_groups``.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..state.broadcast import get


class BroadcastJoin:
    """Left/inner hash join against a broadcast pandas small side."""

    def __init__(self, small_ref, on: str, how: str = "left"):
        self.small = get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


class SemiAntiJoin:
    """Keep rows whose key is (semi) / is not (anti) in a broadcast key set."""

    def __init__(self, keys_ref, on: str, anti: bool = False):
        keys = get(keys_ref)
        self.keys = np.sort(np.asarray(list(keys) if isinstance(keys, (set, frozenset)) else keys))
        self.on = on
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.keys.size == 0:  # empty key set: semi keeps nothing, anti all
            return batch if self.anti else batch.slice(0, 0)
        vals = batch[self.on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.keys, vals)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        member = self.keys[pos] == vals
        return batch.filter(pa.array(~member if self.anti else member))


def semi_join(ds: rd.Dataset, keys: Iterable, on: str) -> rd.Dataset:
    ref = ray.put(np.asarray(sorted(set(keys))))
    return ds.map_batches(
        SemiAntiJoin, batch_format="pyarrow", concurrency=2,
        fn_constructor_args=(ref, on, False)
    )


def anti_join(ds: rd.Dataset, keys: Iterable, on: str) -> rd.Dataset:
    ref = ray.put(np.asarray(sorted(set(keys))))
    return ds.map_batches(
        SemiAntiJoin, batch_format="pyarrow", concurrency=2,
        fn_constructor_args=(ref, on, True)
    )


def group_argmax(
    ds: rd.Dataset, key: str, value: str, tie_col: str
) -> rd.Dataset:
    """Rows achieving the per-group max of ``value``; exact ties broken by
    the smallest ``tie_col`` (deterministic version of the reference's
    comppct_r == max filter, geoEpic/soil/ssurgo_gdb.py:57)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        m = g[value].max()
        best = g[g[value] == m]
        return best.sort_values(tie_col).head(1)

    return ds.groupby(key).map_groups(pick, batch_format="pandas")


def outer_merge_mean(a: pd.DataFrame, b: pd.DataFrame, on: str = "Date") -> pd.DataFrame:
    """J9: outer join on a key; columns appearing in BOTH sides merge to
    their element-wise mean (the reference's GEE collection merge,
    geoEpic/gee/core.py:217-223 — pd.merge outer then mean of _x/_y
    suffix pairs)."""
    merged = a.merge(b, on=on, how="outer", suffixes=("_x", "_y"))
    for col in [c[:-2] for c in merged.columns if c.endswith("_x")]:
        merged[col] = merged[[f"{col}_x", f"{col}_y"]].mean(axis=1)
        merged = merged.drop(columns=[f"{col}_x", f"{col}_y"])
    return merged.sort_values(on).reset_index(drop=True)


def _pd_dtype(t):
    """Ray Schema types are pyarrow DataTypes for Arrow blocks but numpy
    dtypes for pandas blocks (CLAUDE.md) — normalize to a pandas dtype."""
    if isinstance(t, pa.DataType):
        try:
            return t.to_pandas_dtype()
        except (NotImplementedError, pa.ArrowNotImplementedError):
            return object
    return t


def bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    *,
    n_buckets: int = 16,
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    left_dtypes: dict | None = None,
    right_dtypes: dict | None = None,
    int_dtypes: dict | None = None,
) -> rd.Dataset:
    """Partitioned hash join for two LARGE sides (the guide's portable
    pattern): each side scatters to hash(key) % n_buckets partitions via
    the cogroup task exchange, and matching buckets merge pairwise with
    native dtypes on both sides. Use BroadcastJoin when one side fits in
    memory — this path exists for the big-big case and costs a full
    exchange of both sides.

    ``left_cols``/``right_cols`` (each side's non-key columns) can be
    passed when known: ``Dataset.schema()`` on a side whose plan ends in
    a shuffle EXECUTES that shuffle, so deriving them here would run the
    upstream pipeline twice. ``left_dtypes``/``right_dtypes`` (pandas
    dtype per non-key column) type the empty frame a single-sided bucket
    synthesizes for the MISSING side — without them a missing side's
    string columns would come out float64 in single-sided buckets but
    object in mixed ones (per-bucket schema divergence); they are derived
    from the schema automatically when ``left_cols``/``right_cols`` are
    not passed. ``int_dtypes`` is accepted for API compatibility but
    unused — the exchange never pads columns.

    Skew note: salt hot keys into sub-buckets upstream (see
    stages/partition.py) before calling when the key histogram is heavy.
    """

    ldt = dict(left_dtypes or {})
    rdt = dict(right_dtypes or {})
    if left_cols is None or right_cols is None:
        lschema, rschema = left.schema(), right.schema()
        lcols = [c for c in lschema.names if c != on]
        rcols = [c for c in rschema.names if c != on]
        ldt = {c: _pd_dtype(t) for c, t in zip(lschema.names, lschema.types)}
        rdt = {c: _pd_dtype(t) for c, t in zip(rschema.names, rschema.types)}
        ldt.update(left_dtypes or {})
        rdt.update(right_dtypes or {})
    else:
        lcols, rcols = list(left_cols), list(right_cols)
    if set(lcols) & set(rcols):
        raise ValueError("bucket_join sides must have disjoint non-key columns")

    from ..stages import exchange

    key_of = exchange.key_cols_bucket_fn([on], n_buckets)
    require = {"inner": "both", "left": "left", "right": "right"}.get(how, "any")
    nullable = []  # columns that can carry NaN for unmatched rows
    if how in ("left", "outer"):
        nullable += rcols
    if how in ("right", "outer"):
        nullable += lcols

    def _typed_empty(cols: list[str], key_dtype, dtypes: dict) -> pd.DataFrame:
        # real dtypes where known (string value columns MUST stay object —
        # a float64 empty would make single-sided buckets' output schema
        # diverge from mixed buckets'); float is the NaN-capable fallback
        return pd.DataFrame(
            {on: pd.Series([], dtype=key_dtype),
             **{c: pd.Series([], dtype=dtypes.get(c, float)) for c in cols}}
        )

    def join2(l: pd.DataFrame | None, r: pd.DataFrame | None) -> pd.DataFrame:
        if l is None:
            l = _typed_empty(lcols, r[on].dtype, ldt)
        if r is None:
            r = _typed_empty(rcols, l[on].dtype, rdt)
        m = l.merge(r, on=on, how=how)
        # uniform output schema across buckets: a nullable side's integer
        # columns become float64 EVERYWHERE, not only in buckets that
        # happened to have unmatched rows (per-bucket dtype divergence
        # would make the result's schema depend on bucket composition)
        for c in nullable:
            if c in m.columns and pd.api.types.is_integer_dtype(m[c]):
                m[c] = m[c].astype(float)
        return m

    empty = pd.DataFrame(
        {c: pd.Series([], dtype=object) for c in [on] + lcols + rcols}
    )
    lparts, rparts = exchange.scatter_pair(
        left.map_batches(lambda b: b[[on] + lcols], batch_format="pandas"),
        key_of,
        right.map_batches(lambda b: b[[on] + rcols], batch_format="pandas"),
        key_of,
        n_buckets,
    )
    # cogroup exchange: each side keeps its dtypes on the inner path, so
    # int_dtypes restoration (the padded-union wart) is unnecessary
    return exchange.cogroup_map(lparts, rparts, join2, empty, require=require)


def range_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    on: str,
    start: str,
    end: str,
    bucket_width_us: int,
    point_cols: list[str],
    interval_cols: list[str],
    n_buckets: int = 32,
    int_dtypes: dict | None = None,
    empty_template: pd.DataFrame | None = None,
) -> rd.Dataset:
    """Big-big interval join: point rows against interval rows with
    ``start <= on < end`` (timestamps compared at microsecond precision),
    neither side broadcast. The classic Ray-Data-missing operator, built
    from one bucketed shuffle:

    - time is quantized into cells of ``bucket_width_us``; each interval
      EXPLODES to every cell it covers, each point maps to its one cell,
      both land in hash(cell) % n_buckets buckets;
    - inside a bucket a pandas merge on the cell plus the exact range
      predicate finishes the join.

    Pick ``bucket_width_us`` near the MAX interval length: the explode
    factor is ceil(len/width)+1, so width >> typical length wastes
    nothing, width << max length multiplies the interval side. Overlapping
    intervals are fine (a point matches each). Both ``on`` and the
    interval bounds must be int64-microsecond convertibles (pandas
    datetime64[us/ns] or int64). ``int_dtypes`` is accepted for API
    compatibility but unused: the cogroup exchange keeps each side's
    dtypes, so the padded-union float64 degradation cannot occur."""

    w = np.int64(bucket_width_us)

    def _us(col: pd.Series) -> np.ndarray:
        v = col.to_numpy()
        if np.issubdtype(v.dtype, np.datetime64):
            return v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)

    def explode_intervals(b: pd.DataFrame) -> pd.DataFrame:
        s = _us(b[start])
        e = np.maximum(_us(b[end]), s)  # empty/negative intervals -> point
        c0 = s // w
        c1 = (e - 1) // w  # end-exclusive
        counts = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        cell = np.arange(counts.sum(), dtype=np.int64) - np.repeat(offs, counts) + c0[idx]
        out = {"__cell": cell, "__s": s[idx], "__e": e[idx], "__side": np.int64(1)}
        for c in interval_cols:
            out[c] = b[c].to_numpy()[idx]
        return pd.DataFrame(out)

    def tag_points(b: pd.DataFrame) -> pd.DataFrame:
        t = _us(b[on])
        out = {"__cell": t // w, "__t": t, "__side": np.int64(0)}
        for c in point_cols:
            out[c] = b[c].to_numpy()
        return pd.DataFrame(out)

    from ..stages import exchange

    key = exchange.hash_bucket_fn("__cell", n_buckets)

    def join2(p: pd.DataFrame, iv: pd.DataFrame) -> pd.DataFrame:
        # cogroup exchange: each side keeps its own dtypes — no padded
        # union, so int_dtypes restoration is unnecessary by construction
        m = p.drop(columns="__side").merge(
            iv.drop(columns="__side"), on="__cell"
        )
        t = m["__t"].to_numpy(np.int64)
        keep = (m["__s"].to_numpy(np.int64) <= t) & (t < m["__e"].to_numpy(np.int64))
        return m[keep][point_cols + interval_cols]

    # a caller-supplied template keeps the all-empty result's schema equal
    # to the non-empty one (object dtypes would become Arrow null columns)
    empty = (
        empty_template
        if empty_template is not None
        else pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in point_cols + interval_cols}
        )
    )
    pparts, iparts = exchange.scatter_pair(
        points.map_batches(tag_points, batch_format="pandas"),
        key,
        intervals.map_batches(explode_intervals, batch_format="pandas"),
        key,
        n_buckets,
    )
    return exchange.cogroup_map(pparts, iparts, join2, empty, require="both")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_asof",
    left_cols: list[str] | None = None,
    right_dtypes: dict | None = None,
    int_dtypes: dict | None = None,
) -> rd.Dataset:
    """As-of join: for each left row, the latest right row of the same
    ``by`` key with ``on`` <= left's ``on`` (the guide's pattern: bucket
    by key, pandas merge_asof per bucket). Both sides move through one
    cogroup task exchange on the key hash — each side keeps its own
    dtypes, so the padded-union int-to-float64 degradation cannot occur —
    and within a bucket merge_asof is a sorted vectorized pass.

    ``left_cols`` (the left side's full column list) skips the
    ``left.schema()`` derivation, which executes part of the left plan.
    ``right_dtypes`` (pandas dtype per right value column) types the
    empty frame a right-less bucket synthesizes — pass it when right
    value columns are non-numeric, or single-sided buckets would emit
    float64 where mixed buckets emit object. ``int_dtypes`` is accepted
    for API compatibility but no longer needed."""
    from ..stages import exchange

    if left_cols is None:
        lcols = left.schema().names
    else:
        lcols = list(left_cols)
    rkeep = [by, on] + right_cols
    nb = 64
    key_of = exchange.key_cols_bucket_fn([by], nb)

    def merge2(l: pd.DataFrame, r: pd.DataFrame | None) -> pd.DataFrame:
        l = l.sort_values(on, kind="stable")
        if r is None or not len(r):
            # no right rows in this bucket: typed empty so merge_asof's
            # key checks pass; value columns come out float64 NaN exactly
            # as an empty match group would
            rdt = right_dtypes or {}
            r = pd.DataFrame(
                {by: pd.Series([], dtype=l[by].dtype),
                 on: pd.Series([], dtype=l[on].dtype),
                 **{c: pd.Series([], dtype=rdt.get(c, float)) for c in right_cols}}
            )
        # secondary sort on the value columns: among equal-`on` right rows
        # merge_asof picks the LAST, so this makes the pick deterministic
        # under shuffle reordering (highest value wins).
        r = r.sort_values([on] + right_cols, kind="stable")
        r = r.rename(columns={c: c + suffix for c in right_cols})
        m = pd.merge_asof(l, r, on=on, by=by, direction="backward")
        # uniform schema across buckets: asof value columns are nullable,
        # so integer right columns become float64 everywhere — not only in
        # buckets that happened to contain an unmatched left row
        for c in right_cols:
            sc = c + suffix
            if pd.api.types.is_integer_dtype(m[sc]):
                m[sc] = m[sc].astype(float)
        return m

    empty = pd.DataFrame(
        {**{c: pd.Series([], dtype=object) for c in lcols},
         **{c + suffix: pd.Series([], dtype=object) for c in right_cols}}
    )
    lparts, rparts = exchange.scatter_pair(
        left.map_batches(lambda b: b[lcols], batch_format="pandas"),
        key_of,
        right.map_batches(lambda b: b[rkeep], batch_format="pandas"),
        key_of,
        nb,
    )
    return exchange.cogroup_map(lparts, rparts, merge2, empty, require="left")

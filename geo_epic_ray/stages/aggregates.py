"""Pre-aggregated (combiner-style) grouped aggregates.

Ray Data's ``groupby().aggregate()`` is a sort-based shuffle of every
input row; for low-cardinality keys that is orders of magnitude more work
than the aggregation itself (measured: counting 16M rows into 24 tile
groups cost ~170 core-seconds via bare groupby, ~2 via this path). The
scale rule: combine inside ``map_batches`` (one partial row per key per
batch), then run the tiny shuffle over partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def grouped_counts(ds: rd.Dataset, key: str) -> rd.Dataset:
    """count(*) by key with per-batch partial combine."""

    def partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch[key].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({key: keys, "partial_n": counts.astype(np.int64)})

    from ray.data.aggregate import Sum

    return (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def grouped_sums(ds: rd.Dataset, key: str, value_cols: list[str]) -> rd.Dataset:
    """sum(values) + count by key with per-batch partial combine."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(key, as_index=False)[value_cols].sum()
        g["partial_n"] = batch.groupby(key, as_index=False).size()["size"].values
        return g

    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=f"sum_{c}") for c in value_cols]
    aggs.append(Sum("partial_n", alias_name="n"))
    return (
        ds.select_columns([key] + value_cols)
        .map_batches(partial, batch_format="pandas")
        .groupby(key)
        .aggregate(*aggs)
    )


def bucketed_group_agg(
    ds: rd.Dataset,
    keys: list[str],
    pandas_agg,
    n_buckets: int = 64,
    empty: pd.DataFrame | None = None,
    max_bucket_rows: int = 4_000_000,
) -> rd.Dataset:
    """High-cardinality grouped aggregation: rows route to hash(keys) %
    n_buckets partitions via the task exchange (stages/exchange.py — the
    push-shuffle that replaced the per-stage sort cost), then a
    vectorized pandas groupby runs inside each bucket. Ray's native
    groupby pays per-group reduce overhead — ~10s for ~100k tiny groups —
    while this path's cost is one task-wave exchange + C-speed groupbys.
    Exactness unchanged: every row of a key lands in the same bucket.

    ``pandas_agg(df) -> df`` must perform the full groupby-aggregate for
    the rows it is given. ``empty`` supplies the output schema when the
    INPUT is empty (otherwise an empty input yields a schemaless empty
    result).

    Skew guardrail: a bucket holding more than ``max_bucket_rows`` rows
    (a pathological key histogram, or a miscalled ``n_buckets``) is
    re-scattered by a SALTED hash of the same keys into
    ceil(rows / max_bucket_rows) sub-buckets — whole key groups still
    co-route, so the aggregation is unchanged, but no single reduce task
    is asked to concatenate the hot bucket in memory. Costs nothing when
    not triggered (the per-bucket counts are already on the driver)."""
    from . import exchange

    parts = exchange.scatter(ds, n_buckets, exchange.key_cols_bucket_fn(keys, n_buckets))
    return exchange.group_map(
        parts,
        pandas_agg,
        empty if empty is not None else pd.DataFrame(),
        rebucket=lambda nb: exchange.key_cols_bucket_fn(keys, nb, salt=0x5DEECE66D),
        max_bucket_rows=max_bucket_rows,
    )


def partials_to_driver(ds_partials: rd.Dataset, pandas_final) -> pd.DataFrame:
    """Two-level aggregation with driver-side final combine: the dataset
    holds per-batch PARTIAL rows (one row per key per batch — small by
    construction for low-cardinality keys), which are collected and merged
    with one vectorized pandas groupby. Correct at any input scale as long
    as (#blocks x #keys) stays driver-sized; avoids this Ray version's
    multi-second fixed Aggregate cost for what is a trivial merge."""
    return pandas_final(ds_partials.to_pandas())

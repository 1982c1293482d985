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

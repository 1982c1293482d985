"""Spatial partitioner with measured hot-cell salting (SURVEY.md §4 skew row).

The reference never partitions (uniform static chunking, skew unhandled).
At 100 TB the Corn-Belt-style hot cells serialize any cell-keyed shuffle,
so the partitioner measures: a cheap ``groupby(cell_prefix).count()``
(optionally on a sample) finds prefixes holding more than ``target_rows``;
each hot prefix is split into ``ceil(count / target_rows)`` salts and rows
assigned salt = doc_num % n_salts. The resulting ``part_key`` string
("<prefix-hex>" or "<prefix-hex>-s<k>") is the shuffle/write key everywhere
downstream, so one partitioning decision is reused across stages.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from .spatial import doc_nums


def plan_salts(
    ds: "ray.data.Dataset",
    *,
    target_rows: int = 500_000,
    sample_fraction: float | None = None,
    return_total: bool = False,
) -> "dict[int, int] | tuple[dict[int, int], int]":
    """Measure per-prefix counts -> {cell_prefix: n_salts (>1 only)}.

    ``sample_fraction`` counts on a random sample and scales up — at 100 TB
    the plan costs one cheap pass over a 1% sample, not a full count.
    ``return_total`` also returns the (scaled) total row estimate — free
    from the same pass; the write preflight uses it.
    """
    scale = 1.0
    if sample_fraction is not None and sample_fraction < 1.0:
        ds = ds.random_sample(sample_fraction, seed=42)
        scale = 1.0 / sample_fraction
    counts = ds.groupby("cell_prefix").count().to_pandas()
    plan: dict[int, int] = {}
    for prefix, n in zip(counts["cell_prefix"], counts["count()"]):
        est = n * scale
        if est > target_rows:
            plan[int(prefix)] = int(math.ceil(est / target_rows))
    if return_total:
        return plan, int(counts["count()"].sum() * scale)
    return plan


def make_part_keys(batch: pa.Table, salt_plan: dict[int, int]) -> pa.Table:
    """Add the ``part_key`` column from cell_prefix + measured salts."""
    prefix = batch["cell_prefix"].to_numpy()
    # U16 so the "-s<k>" salt suffix fits (numpy silently truncates on
    # assignment into a narrower fixed-width string array).
    keys = np.char.add("c", np.char.zfill(prefix.astype("U8"), 4)).astype("U16")
    if salt_plan:
        nums = doc_nums(batch)
        for p, nsalt in salt_plan.items():
            sel = prefix == p
            if sel.any():
                salts = (nums[sel] % nsalt).astype("U4")
                keys[sel] = np.char.add(np.char.add(keys[sel], "-s"), salts)
    return batch.append_column("part_key", pa.array(keys))

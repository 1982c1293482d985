"""Task-based bucket exchange — a push-based shuffle for bucketed
group-map stages.

Why this exists: the engine's wide operators bucket rows by a hash key
and run a vectorized kernel per bucket. Expressed as
``groupby("__bucket").map_groups(fn)``, every such stage pays Ray Data's
sort-based shuffle: boundary sampling plus two task waves plus plan
overhead — a multi-second FIXED cost per stage on this build, which
dominates chained-dedup pipelines (pairs -> payload join -> pair verify
is three sorts back to back) at any input size. This module implements
the same all-to-all as two waves of plain Ray tasks, the way Ray's own
push-based shuffle works: map tasks split each block into ``n_buckets``
object-store partitions (`scatter`), one reduce task per non-empty
bucket concatenates its partitions and applies the kernel (`group_map` /
`cogroup_map`), and the reduce outputs become the result Dataset via
``from_arrow_refs`` — no sort, no sampling, no per-stage plan rebuild.

Scale notes (100-TB posture):
- identical data movement to a hash shuffle: every row crosses the
  object store exactly once; partitions spill like any other object.
- ``scatter`` is STREAMING: it consumes the upstream plan's blocks as
  the streaming executor produces them (``iter_internal_ref_bundles``),
  submitting one scatter task per block and dropping the driver's ref
  to the input block immediately — so scatter work overlaps upstream
  execution and each input block is released as soon as its scatter
  task finishes. Peak object-store residency is the scattered
  partitions plus the in-flight input wave, never "full input + full
  scattered copy" (the round-2 ``to_arrow_refs()`` barrier).
- ``n_buckets`` plays the reducer-count role — size it to the cluster
  (callers already take it as a parameter).
- the driver holds O(n_blocks x n_buckets) refs and one small counts
  vector per block (the only driver-side sync between the waves); rows
  never reach the driver.
- skewed bucket keys concentrate rows in one reduce task, exactly as
  they would in one reducer of a sort shuffle — salt upstream
  (stages/partition.py) when the key histogram is pathological.

Semantics match the groupby form: `fn` sees each bucket's rows as one
pandas DataFrame (concatenated in deterministic block order) and returns
a DataFrame; empty buckets are skipped entirely. Kernels and bucket fns
can opt into zero-copy Arrow instead: set ``fn.wants_arrow = True`` to
receive a ``pa.Table``, and ``fn.needs_cols = [...]`` on a bucket fn to
have the scatter task prune to those columns before any conversion (the
factory bucketers below do both — on wide string-heavy blocks the
whole-block pandas round-trip was the dominant per-stage cost).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

BucketFn = Callable[[pd.DataFrame], np.ndarray]


def ensure_arrow(blk) -> pa.Table:
    """Blocks from ``iter_internal_ref_bundles`` may be pandas (an
    upstream pandas map_batches) — normalize to Arrow once, task-side."""
    if isinstance(blk, pa.Table):
        return blk
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(blk).to_arrow()


def iter_block_refs(ds: rd.Dataset):
    """Stream the dataset's block refs as the executor produces them.
    The caller must submit each ref to a task (or otherwise take a
    reference) before advancing — this generator drops its own ref."""
    for bundle in ds.iter_internal_ref_bundles():
        yield from bundle.block_refs


@ray.remote
def _scatter_task(blk, bucket_fn: BucketFn, nb: int):
    """One block -> per-bucket row counts + nb table slices (None when
    empty). ``bucket_fn`` maps the block's rows (pandas by default; a
    column-pruned pa.Table when it sets wants_arrow/needs_cols) to int64
    bucket ids in [0, nb)."""
    tbl = ensure_arrow(blk)
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        # upstream map_groups can emit empty blocks with an empty schema
        return (np.zeros(nb, dtype=np.int64), *(None for _ in range(nb)))
    cols = getattr(bucket_fn, "needs_cols", None)
    view = tbl.select(cols) if cols else tbl
    if not getattr(bucket_fn, "wants_arrow", False):
        view = view.to_pandas()
    bk = np.asarray(bucket_fn(view), dtype=np.int64)
    if bk.size and (bk.min() < 0 or bk.max() >= nb):
        # a mismatched bucket_fn/n_buckets pair would otherwise drop rows
        # SILENTLY (searchsorted routes out-of-range ids to no slice)
        raise ValueError(
            f"bucket ids outside [0, {nb}): min={bk.min()}, max={bk.max()}"
        )
    order = np.argsort(bk, kind="stable")
    tbl = tbl.take(order)
    bk = bk[order]
    bounds = np.searchsorted(bk, np.arange(nb + 1))
    counts = np.diff(bounds)
    return (
        counts,
        *(
            tbl.slice(s, e - s) if e > s else None
            for s, e in zip(bounds[:-1], bounds[1:])
        ),
    )


class Scattered(list):
    """scatter()'s result: per-bucket partition-ref lists, PLUS the
    per-bucket row totals the driver already synchronized (free skew
    telemetry — group_map's bucket-size guardrail keys off it)."""

    bucket_rows: np.ndarray


@ray.remote
def _combine_task(*parts: pa.Table) -> pa.Table:
    return _concat(parts)


def scatter(
    ds: rd.Dataset,
    n_buckets: int,
    bucket_fn: BucketFn,
    *,
    wave_combine: int | None = None,
) -> "Scattered":
    """Split every block of ``ds`` into hash buckets, STREAMING: blocks
    are consumed as the upstream plan produces them, so scattering
    overlaps upstream execution and each input block becomes freeable
    the moment its scatter task completes (the task's dependency ref is
    the only one left after this loop drops the bundle). Returns, per
    bucket, the refs of its non-empty partitions (deterministic block
    order). The only driver sync is the per-block counts vector.

    Driver-memory budget (measured, scripts/measure_exchange_refs.py):
    the default path holds n_blocks x (n_buckets + 1) ObjectRefs at
    ~1.5 KB of driver RSS each — 151 MB at 2.5k blocks x 32 buckets,
    478 MB at 10k, 1.99 GB at 40k: linear. Fine through ~10^4 input
    blocks; a 100-TB run with 10^5-10^6 blocks must pass
    ``wave_combine=W`` (two-level scatter): blocks are processed in
    waves of W, each wave's per-bucket partitions are concatenated by
    one combine task, and the driver keeps only the combined ref —
    steady-state refs become n_buckets x ceil(n_blocks / W) + one
    in-flight wave, at the cost of each byte crossing the object store
    one extra time (the classic two-level-shuffle trade). Measured at
    40k blocks x 32 buckets, W=128: driver RSS delta 1,986 MB -> 17.7
    MB (112x), reduce 13.2s -> 0.8s (combines pre-merged), scatter
    76 -> 107s (the per-wave counts sync serializes submission) —
    ~20% slower end-to-end at this scale, and the only shape that
    survives past it."""
    if wave_combine is not None and wave_combine > 0:
        return _scatter_waved(ds, n_buckets, bucket_fn, wave_combine)
    scattered = [
        _scatter_task.options(num_returns=n_buckets + 1).remote(
            r, bucket_fn, n_buckets
        )
        for r in iter_block_refs(ds)
    ]
    if not scattered:
        out = Scattered([] for _ in range(n_buckets))
        out.bucket_rows = np.zeros(n_buckets, dtype=np.int64)
        return out
    counts = ray.get([s[0] for s in scattered])
    out = Scattered(
        [scattered[i][1 + b] for i in range(len(scattered)) if counts[i][b] > 0]
        for b in range(n_buckets)
    )
    out.bucket_rows = np.sum(np.stack(counts), axis=0).astype(np.int64)
    return out


def _scatter_waved(
    ds: rd.Dataset, n_buckets: int, bucket_fn: BucketFn, wave: int
) -> "Scattered":
    """Two-level scatter (see :func:`scatter`): per-wave per-bucket
    combine bounds the driver's ref count at n_buckets x n_waves plus
    one in-flight wave. The per-wave counts sync doubles as scatter
    throttling (at most ``wave`` scatter tasks in flight)."""
    out_parts: list[list[ray.ObjectRef]] = [[] for _ in range(n_buckets)]
    totals = np.zeros(n_buckets, dtype=np.int64)
    pending: list = []

    def flush() -> None:
        nonlocal totals
        if not pending:
            return
        counts = ray.get([s[0] for s in pending])
        for b in range(n_buckets):
            plist = [
                pending[i][1 + b]
                for i in range(len(pending))
                if counts[i][b] > 0
            ]
            if not plist:
                continue
            if len(plist) == 1:
                out_parts[b].append(plist[0])
            else:
                out_parts[b].append(_combine_task.remote(*plist))
        totals += np.sum(np.stack(counts), axis=0).astype(np.int64)
        pending.clear()

    for r in iter_block_refs(ds):
        pending.append(
            _scatter_task.options(num_returns=n_buckets + 1).remote(
                r, bucket_fn, n_buckets
            )
        )
        if len(pending) >= wave:
            flush()
    flush()
    out = Scattered(out_parts)
    out.bucket_rows = totals
    return out


def _concat(parts: tuple[pa.Table, ...]) -> pa.Table:
    if len(parts) == 1:
        return parts[0]
    # permissive promotion: a Dataset.union of sides with different column
    # sets is a legal exchange input (missing columns null-fill, exactly
    # as the sort-shuffle's pandas concat behaved)
    return pa.concat_tables(parts, promote_options="permissive")


def _kernel_input(parts: tuple[pa.Table, ...], fn):
    # kernels receive pandas by default; fn.wants_arrow = True opts into
    # the concatenated pa.Table zero-copy (filters / projections /
    # integer aggregations that run on pyarrow.compute)
    tbl = _concat(parts)
    return tbl if getattr(fn, "wants_arrow", False) else tbl.to_pandas()


def _to_table(out) -> pa.Table:
    # kernels may return pandas (common) or an Arrow table directly (e.g.
    # to emit validity-masked NULL columns)
    if isinstance(out, pa.Table):
        return out
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
def _apply_task(fn, *parts: pa.Table) -> pa.Table:
    return _to_table(fn(_kernel_input(parts, fn)))


@ray.remote
def _coapply_task(fn2, n_left: int, *parts: pa.Table) -> pa.Table:
    left = parts[:n_left]
    right = parts[n_left:]
    ldf = _kernel_input(left, fn2) if left else None
    rdf = _kernel_input(right, fn2) if right else None
    return _to_table(fn2(ldf, rdf))


def _result(tables: list[ray.ObjectRef], empty: pd.DataFrame) -> rd.Dataset:
    if not tables:
        # via Arrow: from_pandas drops the schema of a 0-row frame
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    return rd.from_arrow_refs(tables)


def group_map(
    parts: list[list[ray.ObjectRef]],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    empty: pd.DataFrame,
    *,
    rebucket: Callable[[int], BucketFn] | None = None,
    max_bucket_rows: int | None = None,
    reduce_num_cpus: float | None = None,
) -> rd.Dataset:
    """One reduce task per non-empty bucket: fn(bucket_rows) -> DataFrame.
    ``empty`` supplies the output schema when every bucket is empty.

    ``reduce_num_cpus`` sizes each reduce task's CPU claim (Ray default
    1): a kernel whose per-bucket transient is several GB must claim
    several CPU slots so fewer reducers run concurrently per node —
    claiming k of N slots bounds concurrency at N/k and thus total heap
    at (node heap / N) x N = node heap regardless of k's exact value,
    provided the per-task transient really is ~k x the per-slot share.
    The r5 5M-doc smoke OOM-killed 6.4 GB reducers at 32-way
    concurrency; the same job completes with the claim raised.

    Bucket-size guardrail: when ``max_bucket_rows`` is set, ``parts`` came
    from :func:`scatter` (so per-bucket totals are known), and the caller
    supplies ``rebucket`` — a factory returning a KEY-RESPECTING bucketer
    for ``n_sub`` sub-buckets (same group keys must co-route, a different
    salt than the outer bucketing) — any bucket over the threshold is
    re-scattered into ``ceil(rows / max_bucket_rows)`` sub-buckets and
    reduced as several tasks instead of OOMing one reducer. Only legal for
    kernels whose contract is per-KEY (bucketed_group_agg's "full groupby
    of the rows given"), hence opt-in."""
    rows = getattr(parts, "bucket_rows", None)
    apply_task = (
        _apply_task.options(num_cpus=reduce_num_cpus)
        if reduce_num_cpus is not None
        else _apply_task
    )
    tables = []
    for b, plist in enumerate(parts):
        if not plist:
            continue
        if (
            rebucket is not None
            and max_bucket_rows is not None
            and rows is not None
            and rows[b] > max_bucket_rows
        ):
            n_sub = int(np.ceil(rows[b] / max_bucket_rows))
            sub_fn = rebucket(n_sub)
            sub = [
                _scatter_task.options(num_returns=n_sub + 1).remote(p, sub_fn, n_sub)
                for p in plist
            ]
            sub_counts = ray.get([s[0] for s in sub])
            for sb in range(n_sub):
                sp = [sub[i][1 + sb] for i in range(len(sub)) if sub_counts[i][sb] > 0]
                if sp:
                    tables.append(apply_task.remote(fn, *sp))
        else:
            tables.append(apply_task.remote(fn, *plist))
    return _result(tables, empty)


def cogroup_map(
    parts_left: list[list[ray.ObjectRef]],
    parts_right: list[list[ray.ObjectRef]],
    fn2: Callable[[pd.DataFrame | None, pd.DataFrame | None], pd.DataFrame],
    empty: pd.DataFrame,
    *,
    require: str = "both",
) -> rd.Dataset:
    """Per-bucket cogroup of two scattered datasets — the bucketed-join
    primitive WITHOUT a padded union (each side keeps its own dtypes; the
    union-pads-ints-to-float64 failure mode cannot occur). ``fn2`` gets
    (left_df | None, right_df | None). ``require``: "both" skips buckets
    missing either side (inner join), "left" needs only the left side
    (left/anti shapes), "right" only the right, "any" runs on either."""
    tables = []
    for pl, pr in zip(parts_left, parts_right):
        if require == "both" and not (pl and pr):
            continue
        if require == "left" and not pl:
            continue
        if require == "right" and not pr:
            continue
        if not pl and not pr:
            continue
        tables.append(_coapply_task.remote(fn2, len(pl), *pl, *pr))
    return _result(tables, empty)


def hash_bucket_fn(col: str, n_buckets: int, *, salt: int = 0) -> BucketFn:
    """Standard int64-column bucketer: multiply-xorshift of the values.
    Arrow-native — the scatter task prunes the block to the key column
    and never converts to pandas."""

    def f(tbl: pa.Table) -> np.ndarray:
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        h = (
            v.astype(np.int64, copy=False).view(np.uint64) + np.uint64(salt)
        ) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    f.wants_arrow = True
    f.needs_cols = [col]
    return f


def column_values_bucket_fn(col: str) -> BucketFn:
    """Bucketer for a precomputed bucket-id column: the values ARE the
    bucket ids. Arrow-native with column pruning, so blocks carrying
    heavy payload columns are never converted just to read the ids."""

    def f(tbl: pa.Table) -> np.ndarray:
        return tbl.column(col).to_numpy(zero_copy_only=False).astype(np.int64)

    f.wants_arrow = True
    f.needs_cols = [col]
    return f


def scatter_pair(
    ds_a: rd.Dataset,
    fn_a: BucketFn,
    ds_b: rd.Dataset,
    fn_b: BucketFn,
    n_buckets: int,
) -> tuple[list[list[ray.ObjectRef]], list[list[ray.ObjectRef]]]:
    """Scatter two datasets CONCURRENTLY (two driver threads): a cogroup
    join's sides are independent pipelines, and scattering them
    sequentially makes the wall time T(a) + T(b) where the old
    single-plan union form overlapped them — two threads restore
    ~max(T(a), T(b)). Ray supports concurrent Dataset executions from one
    driver session."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        fa = ex.submit(scatter, ds_a, n_buckets, fn_a)
        fb = ex.submit(scatter, ds_b, n_buckets, fn_b)
        return fa.result(), fb.result()


def key_cols_bucket_fn(
    key_cols: list[str], n_buckets: int, *, salt: int = 0
) -> BucketFn:
    """Multi-column bucketer (FNV-combine of per-column pandas hashes) —
    the ONE definition of the block-key hash every stage that co-partitions
    on the same key tuple must share (blocked_pair_edges /
    blocked_components and any future blocking stage). ``salt`` decorrelates
    a second-level split (group_map's bucket guardrail) from the outer
    routing; the default 0 is the shared co-partitioning hash."""

    # wrap-correct salt constant computed in Python ints: a numpy scalar
    # uint64 multiply emits RuntimeWarning on overflow (crash under -W error)
    salt_c = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))

    def f(tbl: pa.Table) -> np.ndarray:
        h = np.full(tbl.num_rows, salt_c, dtype=np.uint64)
        for k in key_cols:
            # per-column 1-D conversion only of the key columns (the
            # scatter task prunes via needs_cols); string keys still go
            # through pandas' hash_array on the object array, numerics
            # are zero-copy
            h = h * np.uint64(1099511628211) + pd.util.hash_array(
                tbl.column(k).to_numpy(zero_copy_only=False)
            ).astype(np.uint64)
        # splitmix64-style finalizer. Without it the salt enters the FNV
        # combine AFFINELY (salted = unsalted + salt_c * FNV^len), so for
        # the power-of-two n_buckets every caller uses, a hot outer
        # bucket (unsalted mod n_buckets fixed) routed 100% of its rows
        # to ONE sub-reducer whenever gcd(n_sub, n_buckets) > 1 — the
        # guardrail split silently did nothing (ADVICE r4).
        h ^= h >> np.uint64(30)
        h = h * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    f.wants_arrow = True
    f.needs_cols = list(key_cols)
    return f

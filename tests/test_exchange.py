"""Task-based bucket exchange: semantics vs the groupby form."""

import numpy as np
import pandas as pd
import ray.data as rd

from geo_epic_ray.stages import exchange


def _df(n, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, 50, n).astype(np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )


def test_group_map_equals_pandas_groupby(ray_session):
    df = _df(5000)
    ds = rd.from_pandas(df).repartition(7)
    parts = exchange.scatter(ds, 8, exchange.hash_bucket_fn("k", 8))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    got = (
        exchange.group_map(parts, agg, empty)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_group_map_empty_dataset_returns_template(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=np.int64)}))
    parts = exchange.scatter(ds, 4, exchange.hash_bucket_fn("k", 4))
    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "n": pd.Series([], dtype=np.int64)})
    out = exchange.group_map(parts, lambda g: g.assign(n=1), empty)
    # the DATASET carries the template schema (Ray's to_pandas drops the
    # columns of a 0-row dataset — a conversion quirk, not an exchange one)
    assert out.count() == 0 and out.schema().names == ["k", "n"]


def test_cogroup_inner_semantics_and_dtype_preservation(ray_session):
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                         "a": np.array([10, 20, 30, 40], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([2, 3, 5], dtype=np.int64),
                          "b": np.array([200, 300, 500], dtype=np.int64)})
    lp = exchange.scatter(rd.from_pandas(left).repartition(2), 4,
                          exchange.hash_bucket_fn("k", 4))
    rp = exchange.scatter(rd.from_pandas(right).repartition(2), 4,
                          exchange.hash_bucket_fn("k", 4))

    def join2(l, r):
        m = l.merge(r, on="k", how="inner")
        # no padded union: both sides must arrive as int64
        assert m.a.dtype == np.int64 and m.b.dtype == np.int64
        return m

    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in ["k", "a", "b"]})
    got = (
        exchange.cogroup_map(lp, rp, join2, empty, require="both")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_cogroup_require_left_runs_without_right(ray_session):
    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64)})
    right = pd.DataFrame({"k": pd.Series([], dtype=np.int64)})
    lp = exchange.scatter(rd.from_pandas(left), 4, exchange.hash_bucket_fn("k", 4))
    rp = exchange.scatter(rd.from_pandas(right), 4, exchange.hash_bucket_fn("k", 4))

    def f(l, r):
        assert r is None or len(r) == 0
        return pd.DataFrame({"k": l.k, "seen": np.int64(1)})

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "seen": pd.Series([], dtype=np.int64)})
    out = exchange.cogroup_map(lp, rp, f, empty, require="left").to_pandas()
    assert len(out) == 20


def test_scatter_routing_is_total_and_disjoint(ray_session):
    df = _df(3000, seed=5)
    ds = rd.from_pandas(df).repartition(5)
    nb = 6
    parts = exchange.scatter(ds, nb, exchange.hash_bucket_fn("k", nb))
    import ray as _ray

    seen = []
    bucket_fn = exchange.hash_bucket_fn("k", nb)
    for b, plist in enumerate(parts):
        for ref in plist:
            tbl = _ray.get(ref)
            # the factory bucketer is Arrow-native (wants_arrow)
            assert (bucket_fn(tbl.select(["k"])) == b).all()
            seen.append(tbl.to_pandas())
    total = pd.concat(seen) if seen else pd.DataFrame(columns=["k", "v"])
    assert len(total) == len(df)  # every row exactly once
    pd.testing.assert_frame_equal(
        total.sort_values(["k", "v"]).reset_index(drop=True),
        df.sort_values(["k", "v"]).reset_index(drop=True),
    )


def test_bucket_join_outer_and_right_keep_unmatched_rows(ray_session):
    from geo_epic_ray.stages.joins import bucket_join

    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                         "a": np.array([10, 20], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([2, 3], dtype=np.int64),
                          "b": np.array([200, 300], dtype=np.int64)})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    for how, want_keys in [("inner", {2}), ("left", {1, 2}),
                           ("right", {2, 3}), ("outer", {1, 2, 3})]:
        got = bucket_join(lds, rds, "k", n_buckets=4, how=how).to_pandas()
        assert set(got.k) == want_keys, how
        # nullable-side integer columns are float64 in EVERY bucket
        if how in ("left", "outer"):
            assert got.b.dtype == np.float64, how
        if how in ("right", "outer"):
            assert got.a.dtype == np.float64, how


def test_scatter_accepts_pandas_blocks_and_arrow_kernels(ray_session):
    """Streaming scatter must handle pandas-format upstream blocks
    (ensure_arrow), pandas custom bucket fns (back-compat), and
    wants_arrow kernels (zero-copy reduce)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    df = _df(2000, seed=7)
    # a pandas map_batches upstream yields pandas blocks
    ds = rd.from_pandas(df).repartition(4).map_batches(
        lambda b: b, batch_format="pandas"
    )

    def pandas_bucket(b: pd.DataFrame) -> np.ndarray:
        return (b["k"].to_numpy() % 5).astype(np.int64)

    parts = exchange.scatter(ds, 5, pandas_bucket)

    def agg(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "v"])

    agg.wants_arrow = True
    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    got = (
        exchange.group_map(parts, agg, empty)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)["v"].sum()
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

def test_group_map_bucket_guardrail_splits_hot_bucket(ray_session):
    # pathological histogram: n_buckets=1 concentrates 100% of rows in one
    # bucket; the guardrail must split the reduce into key-respecting
    # sub-tasks without changing the aggregation
    df = _df(6000, seed=3)
    ds = rd.from_pandas(df).repartition(5)
    parts = exchange.scatter(ds, 1, exchange.key_cols_bucket_fn(["k"], 1))
    assert parts.bucket_rows.tolist() == [6000]

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    out = exchange.group_map(
        parts, agg, empty,
        rebucket=lambda nb: exchange.key_cols_bucket_fn(["k"], nb, salt=99),
        max_bucket_rows=500,
    )
    # the split produced several reduce outputs (blocks), not one
    assert out.materialize().num_blocks() > 1
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_scatter_wave_combine_equals_default(ray_session):
    # two-level scatter: identical group_map results and bucket_rows,
    # bounded driver refs (n_buckets x n_waves instead of n_blocks x
    # n_buckets)
    df = _df(6000, seed=5)
    ds = rd.from_pandas(df).repartition(23)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    base = exchange.scatter(ds, 8, exchange.key_cols_bucket_fn(["k"], 8))
    for w in (1, 4, 100):  # waves smaller, mid, larger than block count
        parts = exchange.scatter(
            ds, 8, exchange.key_cols_bucket_fn(["k"], 8), wave_combine=w
        )
        np.testing.assert_array_equal(parts.bucket_rows, base.bucket_rows)
        n_waves = -(-23 // w)
        assert all(len(p) <= n_waves for p in parts)
        got = (
            exchange.group_map(parts, agg, empty)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_salted_rebucket_decorrelated_from_outer_hash():
    # Regression for the affine-salt bug (ADVICE r4): with power-of-two
    # n_buckets, rows sharing an outer bucket must NOT all land in one
    # sub-bucket for even n_sub. Pure hash-function property — no Ray.
    import pyarrow as pa

    keys = np.arange(200_000, dtype=np.int64)
    tbl = pa.table({"k": keys})
    outer = exchange.key_cols_bucket_fn(["k"], 64)(tbl)
    hot = np.bincount(outer, minlength=64).argmax()
    hot_tbl = pa.table({"k": keys[outer == hot]})
    assert hot_tbl.num_rows > 1000
    for n_sub in (2, 4, 8):
        sub = exchange.key_cols_bucket_fn(["k"], n_sub, salt=99)(hot_tbl)
        counts = np.bincount(sub, minlength=n_sub)
        # every sub-bucket gets a meaningful share (not 100%/0%)
        assert (counts > hot_tbl.num_rows // (4 * n_sub)).all(), counts
    # key-respecting: the same key value always routes to the same
    # sub-bucket (trivially true for distinct ints; assert on duplicates)
    dup = pa.table({"k": np.repeat(keys[outer == hot][:100], 3)})
    sub = exchange.key_cols_bucket_fn(["k"], 4, salt=99)(dup)
    assert (sub.reshape(-1, 3) == sub.reshape(-1, 3)[:, :1]).all()


def test_group_map_guardrail_splits_hot_bucket_pow2(ray_session):
    # end-to-end with power-of-two n_buckets=64 and an even split: the
    # hot bucket must fan out across >1 sub-reducers (pre-fix: all rows
    # routed to one) and the aggregate must be unchanged
    import pyarrow as pa

    rng = np.random.default_rng(11)
    all_keys = np.arange(50_000, dtype=np.int64)
    outer_of = exchange.key_cols_bucket_fn(["k"], 64)(pa.table({"k": all_keys}))
    hot_id = np.bincount(outer_of, minlength=64).argmax()
    hot_keys = all_keys[outer_of == hot_id]  # many DISTINCT keys, one bucket
    df = pd.DataFrame({
        "k": rng.choice(hot_keys, 8000).astype(np.int64),
        "v": rng.integers(0, 1000, 8000).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(4)
    parts = exchange.scatter(ds, 64, exchange.key_cols_bucket_fn(["k"], 64))
    hot = int(parts.bucket_rows.max())
    assert hot == 8000  # everything concentrates into the hot bucket

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    out = exchange.group_map(
        parts, agg, empty,
        rebucket=lambda nb: exchange.key_cols_bucket_fn(["k"], nb, salt=99),
        max_bucket_rows=hot // 2,  # forces an even n_sub = 2 split
    )
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # >1 non-empty sub-reducer outputs for the hot bucket: total output
    # blocks exceed the number of non-empty buckets
    n_nonempty = int((parts.bucket_rows > 0).sum())
    assert out.materialize().num_blocks() > n_nonempty


def test_bucketed_group_agg_guardrail_end_to_end(ray_session):
    from geo_epic_ray.stages.aggregates import bucketed_group_agg

    df = _df(4000, seed=7)
    ds = rd.from_pandas(df).repartition(4)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    got = (
        bucketed_group_agg(ds, ["k"], agg, n_buckets=1, max_bucket_rows=300)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_group_map_reduce_num_cpus_same_result(ray_session):
    """A reduce CPU claim changes scheduling only, never the answer —
    the knob big-budget pair kernels use to bound per-node reduce
    concurrency (the r5 5M smoke OOM-killed 32-way 6.4 GB reducers)."""
    df = _df(3000)
    ds = rd.from_pandas(df).repartition(5)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    outs = []
    for claim in (None, 2.0):
        parts = exchange.scatter(ds, 8, exchange.hash_bucket_fn("k", 8))
        outs.append(
            exchange.group_map(parts, agg, empty, reduce_num_cpus=claim)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    want = (
        df.groupby("k", as_index=False)["v"].sum()
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(outs[0], want)

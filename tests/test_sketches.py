"""HLL + Bloom sketches: accuracy, mergeability, pipeline use."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.stages.sketches import HLL, BloomFilter


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 50, 50_000).astype(np.int64)
    b = rng.integers(0, 1 << 50, 50_000).astype(np.int64)
    true = np.union1d(a, b).size
    h1 = HLL(12).add(a)
    h2 = HLL(12).add(b)
    est = h1.merge(h2).estimate()
    assert abs(est - true) / true < 0.05  # ~1.04/sqrt(4096) = 1.6% typical
    # merge == add-all
    est_all = HLL(12).add(np.concatenate([a, b])).estimate()
    assert est == pytest.approx(est_all)


def test_hll_small_range_linear_counting():
    vals = np.arange(100, dtype=np.int64)
    est = HLL(12).add(vals).estimate()
    assert abs(est - 100) < 5


def test_hll_distinct_pipeline(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.sketches import hll_distinct

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet", columns=["user_id"])
    est = hll_distinct(ds, "user_id")
    true = pd.read_parquet(
        "/root/testdata/sf0.01/events.parquet", columns=["user_id"]
    ).user_id.nunique()
    assert abs(est - true) / true < 0.05


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 1 << 40, 20_000).astype(np.int64)
    others = rng.integers(1 << 41, 1 << 42, 20_000).astype(np.int64)
    bf = BloomFilter(n_bits=1 << 19, k=4).add(members)
    assert bf.contains(members).all()  # no false negatives, ever
    fp = bf.contains(others).mean()
    assert fp < 0.05


def test_tdigest_quantiles_accuracy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geo_epic_ray.stages.sketches import TDigest, tdigest_quantiles

    rng = np.random.default_rng(8)
    vals = np.concatenate([rng.normal(100, 15, 40_000), rng.exponential(30, 20_000)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    est = tdigest_quantiles(ds, "v", [0.01, 0.1, 0.5, 0.9, 0.99])
    spread = vals.max() - vals.min()
    for q, e in est.items():
        exact = np.quantile(vals, q)
        assert abs(e - exact) / spread < 0.01, (q, e, exact)

    # mergeability: split-digest == whole-digest within tolerance
    a = TDigest().add(vals[:30_000])
    b = TDigest().add(vals[30_000:])
    merged = a.merge(b)
    whole = TDigest().add(vals)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - whole.quantile(q)) / spread < 0.01


def test_hll_grouped_matches_global_merge(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.sketches import HLL, hll_grouped_distinct

    rng = np.random.default_rng(3)
    n = 30000
    key = np.where(rng.random(n) < 0.7, "a", "b")
    val = rng.integers(0, 5000, n)
    df = pd.DataFrame({"k": key, "v": val})
    ds = rd.from_pandas(df).repartition(6)
    got = hll_grouped_distinct(ds, "k", "v", p=12, n_buckets=4).to_pandas()
    got = dict(zip(got.k, got.estimate))
    for k in ["a", "b"]:
        vals = df[df.k == k].v.to_numpy()
        # grouped merge must equal a single-process HLL over the same rows
        want = HLL(12).add(vals).estimate()
        assert abs(got[k] - want) < 1e-9, (k, got[k], want)
        exact = len(np.unique(vals))
        assert abs(got[k] - exact) / exact < 0.05


def test_binned_tdigest_deterministic_and_accurate(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.sketches import (
        _binned_centroids,
        binned_tdigest_quantiles,
        merge_binned_centroids,
    )

    rng = np.random.default_rng(11)
    n = 60_000
    vals = np.concatenate([rng.normal(50, 9, n // 2), rng.exponential(20, n // 2)])
    keys = rng.integers(0, 1 << 30, n).astype(np.int64)
    df = pd.DataFrame({"event_id": keys, "value": vals})

    # partition-independence: the binned compress is a pure function of
    # the multiset, so different block splits give identical centroids
    b1 = _binned_centroids(vals, 100)
    b2 = _binned_centroids(np.random.default_rng(0).permutation(vals), 100)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)

    import ray.data as rd
    ds4 = rd.from_pandas(df).repartition(4)
    ds16 = rd.from_pandas(df).repartition(16)
    qs = [0.1, 0.5, 0.9]
    e4 = binned_tdigest_quantiles(ds4, "value", "event_id", qs)
    e16 = binned_tdigest_quantiles(ds16, "value", "event_id", qs)
    assert e4 == e16  # bit-identical across partitionings
    spread = vals.max() - vals.min()
    for q in qs:
        assert abs(e4[q] - np.quantile(vals, q)) / spread < 0.01, (q, e4[q])

    # driver merge edge branches: a quantile below the first centroid
    # midpoint and above the last one clamp instead of extrapolating
    cent = pd.DataFrame({"bkt": [0, 0], "bin": [0, 1], "m": [1.0, 9.0], "w": [4.0, 4.0]})
    out = merge_binned_centroids(cent, [0.01, 0.99, 0.5], delta=100)
    assert out[0.01] == 1.0 and out[0.99] == 9.0
    assert 1.0 < out[0.5] < 9.0


def test_pq_adc_recall_on_structured_vectors(ray_session):
    """PQ pieces on PLANTED-STRUCTURE vectors (cluster + noise): encode ->
    ADC candidates must recall the exact top-k at small r, and the rerank
    returns the exact ranking."""
    import ray.data as rd

    from geo_epic_ray.stages.similarity import (ann_topk, pq_encode,
                                                pq_topk_rerank,
                                                train_pq_codebooks)

    rng = np.random.default_rng(3)
    base = rng.standard_normal((8, 32))
    x = np.repeat(base, 50, axis=0) + 0.1 * rng.standard_normal((400, 32))
    ids = np.arange(400, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(x)})
    ds = rd.from_pandas(df).repartition(4).materialize()
    books = train_pq_codebooks(x, m=4, ks=16)
    codes = pq_encode(ds, books).materialize()
    q = x[7]
    exact = ann_topk(ds, q[None, :], k=5).to_pandas().sort_values("rank")
    got = pq_topk_rerank(ds, codes, books, q, k=5, r=64)
    assert got.vec_id.tolist() == exact.vec_id.tolist()
    assert (np.round(got.cosine.to_numpy(), 9)
            == np.round(exact.cosine.to_numpy(), 9)).all()

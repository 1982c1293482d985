"""Distributed k-means vs a single-process numpy twin; CMS properties."""

import numpy as np
import pandas as pd
import ray.data as rd

from geo_epic_ray.stages.cluster import kmeans_fit
from geo_epic_ray.stages.sketches import CountMinSketch


def _numpy_kmeans(x, ids, k, n_iter):
    order = np.argsort(ids)
    init = order[:k]  # k smallest ids
    c = x[init].astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = (x * x).sum(1)[:, None] - 2 * x @ c.T + (c * c).sum(1)[None, :]
        a = d2.argmin(1)
        n = np.bincount(a, minlength=k)
        for j in range(k):
            if n[j]:
                c[j] = x[a == j].mean(axis=0)
        sse = d2[np.arange(len(a)), a]
        stats = pd.DataFrame(
            {"centroid_id": np.arange(k), "n": n, "inertia": np.bincount(a, weights=sse, minlength=k)}
        )
    return c, stats


def test_kmeans_matches_numpy_twin(ray_session):
    rng = np.random.default_rng(11)
    n, d, k = 300, 8, 5
    centers = rng.normal(size=(k, d)) * 5
    x = centers[rng.integers(0, k, n)] + rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": [row for row in x]})
    ).repartition(4)
    cent, stats = kmeans_fit(ds, k=k, n_iter=4)
    ref_c, ref_stats = _numpy_kmeans(x, ids, k, 4)
    # distributed summation order differs -> allclose, counts exact
    assert np.allclose(cent, ref_c, atol=1e-8)
    assert stats.n.tolist() == ref_stats.n.tolist()
    assert np.allclose(stats.inertia, ref_stats.inertia, atol=1e-6)


def test_kmeans_k_larger_than_data(ray_session):
    x = np.eye(3)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(3, dtype=np.int64), "embedding": [r for r in x]})
    )
    cent, stats = kmeans_fit(ds, k=10, n_iter=2)
    assert cent.shape == (3, 3)
    assert stats.n.sum() == 3


def test_cms_one_sided_and_mergeable():
    rng = np.random.default_rng(3)
    vals = rng.zipf(1.5, 30000).astype(np.int64)
    uniq, cnt = np.unique(vals, return_counts=True)
    s = CountMinSketch().add(vals)
    est = s.estimate(uniq)
    assert (est >= cnt).all()  # one-sided error
    # heavy hitters essentially exact at this width
    top = np.argsort(cnt)[-10:]
    assert (est[top] - cnt[top]).max() <= 2
    # merge == add-all
    m = CountMinSketch().add(vals[:15000]).merge(CountMinSketch().add(vals[15000:]))
    assert (m.estimate(uniq) == est).all()
    # bytes round-trip
    rt = CountMinSketch.from_bytes(s.to_bytes())
    assert (rt.estimate(uniq) == est).all()


def test_grouped_tdigest_accuracy(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.sketches import grouped_tdigest_quantiles

    rng = np.random.default_rng(5)
    n = 40000
    key = rng.integers(0, 4, n)
    val = rng.normal(loc=key * 10.0, scale=1.0 + key)
    df = pd.DataFrame({"k": key, "v": val})
    ds = rd.from_pandas(df).repartition(8)
    est = grouped_tdigest_quantiles(ds, "k", "v", [0.1, 0.5, 0.9], n_buckets=4).to_pandas()
    for _, row in est.iterrows():
        g = df[df.k == row.k].v.to_numpy()
        for q, col in [(0.1, "p10"), (0.5, "p50"), (0.9, "p90")]:
            # rank error: the estimate's true rank must be within 2% of q
            rank = (g <= row[col]).mean()
            assert abs(rank - q) < 0.02, (row.k, q, rank)


def test_semdedup_matches_singleprocess_greedy(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.cluster import kmeans_fit, semdedup

    rng = np.random.default_rng(17)
    base = rng.standard_normal((60, 16))
    # plant near-dups: rows 60..79 are perturbed copies of rows 0..19
    twins = base[:20] + 0.03 * rng.standard_normal((20, 16))
    vecs = np.vstack([base, twins])
    df = pd.DataFrame({"vec_id": np.arange(80, dtype=np.int64), "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(4)

    got = (
        semdedup(ds, k=4, n_iter=3, threshold=0.9, n_buckets=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # single-process oracle: same centroids (deterministic kmeans_fit),
    # same assignment rule, same greedy keep-first sweep
    centroids, _ = kmeans_fit(ds, 4, 3)
    x = vecs.astype(np.float64)
    d2 = (x * x).sum(1)[:, None] - 2 * x @ centroids.T + (centroids * centroids).sum(1)[None, :]
    cid = d2.argmin(axis=1)
    norm = x / np.linalg.norm(x, axis=1, keepdims=True)
    want_kept = np.zeros(80, dtype=bool)
    for c in range(4):
        members = np.flatnonzero(cid == c)
        kept_rows = []
        for i in members:
            if not kept_rows or (norm[kept_rows] @ norm[i]).max() < 0.9:
                want_kept[i] = True
                kept_rows.append(i)
    assert (got.cluster_id.to_numpy() == cid).all()
    assert (got.kept.to_numpy() == want_kept).all()
    # the planted twins must be pruned when co-clustered with the original
    same_cluster = cid[60:] == cid[:20]
    assert (~got.kept.to_numpy()[60:] | ~same_cluster).all()

"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: exact brute-force cosine top-k — each batch computes a
  numpy matmul against the broadcast, L2-normalized query matrix, emits
  its per-batch top-k, and a tiny grouped merge keeps the global top-k
  per query. No full-dataset materialization; the shuffle carries only
  batch_count * k rows per query.
- ``ivf_topk``: the scale path — vectors are bucketed by nearest centroid
  (an IVF coarse quantizer trained driver-side on a sample); a query only
  scans the ``nprobe`` nearest buckets. Recall < 1 by construction; the
  bench compares its recall/latency against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: np.ndarray | None = None,
) -> rd.Dataset:
    """Exact cosine top-k per query row. Returns (query_id, vec_id, rank,
    cosine) — rank 1..k, ties broken by lowest vec_id."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qm, exclude_ids))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q, excl = ray.get(qref)
        emb = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        sims = emb @ q.T  # (n, nq)
        frames = []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            mask = np.ones(ids.size, dtype=bool)
            if excl is not None:
                mask &= ids != excl[qi]
            order = np.lexsort((ids[mask], -s[mask]))[:k]
            sel = np.nonzero(mask)[0][order]
            frames.append(
                pd.DataFrame(
                    {"query_id": qi, id_col: ids[sel], "cosine": s[sel]}
                )
            )
        return pd.concat(frames, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Plain k-means on a driver-side sample (spherical: normalized)."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    c = x[rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(c.shape[0]):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """IVF-bucketed approximate top-k: scan only vectors whose nearest
    centroid is among each query's nprobe closest centroids."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    probe = np.argsort(-(qm @ c.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qm, c, probe))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q, cc, pr = ray.get(ref)
        emb = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        assign = np.argmax(emb @ cc.T, axis=1)
        frames = []
        for qi in range(q.shape[0]):
            m = np.isin(assign, pr[qi])
            if not m.any():
                continue
            s = emb[m] @ q[qi]
            order = np.lexsort((ids[m], -s))[:k]
            sel = np.nonzero(m)[0][order]
            frames.append(pd.DataFrame({"query_id": qi, id_col: ids[sel], "cosine": emb[sel] @ q[qi]}))
        if not frames:
            return pd.DataFrame({"query_id": [], id_col: [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )

"""Distributed k-means (Lloyd) over an embedding column.

The scale shape for clustering 10^12 embeddings: centroids are SMALL
state (k x d floats) broadcast once per iteration via ``ray.put``; the
data Dataset is streamed per iteration in vectorized batches that emit
per-centroid PARTIAL sums (k rows per batch — bounded), merged driver
side into new centroids. Nothing materializes the vector table; cost is
``n_iter`` streaming passes. The IVF coarse quantizer
(stages/similarity.py train_ivf_centroids, sample-trained) is the cheap
sibling; this is the full-data refinement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .vectors import list_column_matrix


@ray.remote
def _km_init_block(tbl, id_col: str, vec_col: str, k: int):
    """k smallest-id (id, vector) rows of one block, as numpy — Arrow
    buffers only, no block-wide pandas conversion (see stages/vectors)."""
    if tbl.num_rows == 0:
        return None
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    x = list_column_matrix(tbl, vec_col)
    sel = np.argsort(ids, kind="stable")[:k]
    return ids[sel], x[sel]


@ray.remote
def _km_assign_block(tbl, c: np.ndarray, k: int, vec_col: str):
    """One Lloyd assignment over one block: per-centroid (count, sse,
    sum-vector) partials. Returns three dense arrays — k rows regardless
    of block size, so the driver merge is bounded."""
    d = c.shape[1]
    if tbl.num_rows == 0:
        return np.zeros(k, np.int64), np.zeros(k), np.zeros((k, d))
    x = list_column_matrix(tbl, vec_col)
    d2 = (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )
    a = d2.argmin(axis=1)
    sse = d2[np.arange(len(a)), a]
    sums = np.empty((k, d))
    for j in range(d):
        sums[:, j] = np.bincount(a, weights=x[:, j], minlength=k)
    return (
        np.bincount(a, minlength=k).astype(np.int64),
        np.bincount(a, weights=sse, minlength=k),
        sums,
    )


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    n_iter: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, pd.DataFrame]:
    """Lloyd iterations with deterministic init (the k vectors with the
    smallest ids). Empty clusters keep their previous centroid. Returns
    (centroids (k,d) float64, per-cluster stats DataFrame with columns
    centroid_id, n, inertia) — stats from one final assignment pass.

    Iterations run as one task WAVE per pass over the pinned blocks (the
    same raw-task escape hatch as connected components: an iterative
    driver loop pays Ray Data's per-execution plan overhead every pass,
    while a task wave costs milliseconds). Centroids broadcast once per
    iteration via ``ray.put``; each task returns k dense partial rows, so
    the driver merge is bounded by k x #blocks regardless of data size."""
    refs = ds.to_arrow_refs()
    parts = (
        [
            p
            for p in ray.get(
                [_km_init_block.remote(r, id_col, vec_col, k) for r in refs]
            )
            if p is not None
        ]
        if refs
        else []
    )
    if not parts:
        # np.concatenate([]) would raise obscurely
        raise ValueError("kmeans_fit: input dataset has no vectors")
    all_ids = np.concatenate([p[0] for p in parts])
    all_vecs = np.concatenate([p[1] for p in parts], axis=0)
    order = np.argsort(all_ids, kind="stable")[:k]
    centroids = all_vecs[order]
    k = centroids.shape[0]  # corpus smaller than k
    d = centroids.shape[1]

    stats = None
    for _ in range(n_iter):
        cref = ray.put(centroids)
        parts = ray.get(
            [_km_assign_block.remote(r, cref, k, vec_col) for r in refs]
        )
        n = np.zeros(k, np.int64)
        sse = np.zeros(k)
        sums = np.zeros((k, d))
        for pn, ps, pm in parts:  # deterministic block order
            n += pn
            sse += ps
            sums += pm
        nonempty = n > 0
        centroids = np.where(
            nonempty[:, None], sums / np.maximum(n, 1)[:, None], centroids
        )
        stats = pd.DataFrame(
            {"centroid_id": np.arange(k, dtype=np.int64), "n": n, "inertia": sse}
        )
    return centroids, stats


def semdedup(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 4,
    threshold: float = 0.95,
    n_buckets: int = 32,
) -> rd.Dataset:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by k-means
    clustering + within-cluster cosine pruning. Vectors are clustered
    (``kmeans_fit`` — centroids broadcast per iteration, nothing
    materialized), each cluster's members gather in one bucket, and a
    deterministic greedy sweep in ascending-id order keeps a vector only
    if its cosine to every ALREADY-KEPT cluster member is below
    ``threshold`` (keep-first semantics — the same rule as the exact
    dedup family, so outputs are batching-independent).

    Scale posture: the only all-to-all is the single cluster-key
    exchange; per-cluster work is O(m^2) dot products, the algorithm's
    inherent cost — size ``k`` so corpus/k members fit a worker (the
    paper runs k = 11k clusters for 600M embeddings; a pathologically hot
    cluster is a data-distribution smell, not an engine knob).

    Returns (id_col, cluster_id, kept) — one row per vector.
    """
    from . import exchange

    empty = pd.DataFrame(
        {
            id_col: np.empty(0, np.int64),
            "cluster_id": np.empty(0, np.int64),
            "kept": np.empty(0, bool),
        }
    )
    ds = ds.materialize()  # consumed by kmeans_fit AND the assignment pass
    if ds.count() == 0:
        # kmeans on nothing is a ValueError; semdedup of nothing is nothing
        import pyarrow as pa

        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    centroids, _ = kmeans_fit(
        ds, k, n_iter, id_col=id_col, vec_col=vec_col
    )
    cref = ray.put(centroids)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = d2.argmin(axis=1)
        norm = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "cluster_id": a.astype(np.int64),
                "vec_bytes": [row.tobytes() for row in norm],
            }
        )

    assigned = ds.map_batches(assign, batch_format="pandas")

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: np.empty(0, np.int64),
                    "cluster_id": np.empty(0, np.int64),
                    "kept": np.empty(0, bool),
                }
            )
        out = []
        for cid, grp in g.groupby("cluster_id", sort=True):
            grp = grp.sort_values(id_col, kind="stable")
            ids = grp[id_col].to_numpy()
            mat = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in grp.vec_bytes]
            )
            m = len(ids)
            kept = np.zeros(m, dtype=bool)
            # greedy keep-first over a PREALLOCATED kept-matrix: appending
            # row i and dotting kept_mat[:nk] @ mat[i] avoids the O(m^2)
            # per-iteration 2-D row re-gather (the THP-page-fault loop
            # CLAUDE.md bans on hot buckets)
            kept_mat = np.empty_like(mat)
            nk = 0
            for i in range(m):
                if nk == 0 or (kept_mat[:nk] @ mat[i]).max() < threshold:
                    kept[i] = True
                    kept_mat[nk] = mat[i]
                    nk += 1
            out.append(
                pd.DataFrame(
                    {id_col: ids, "cluster_id": cid, "kept": kept}
                )
            )
        return pd.concat(out, ignore_index=True)

    parts = exchange.scatter(
        assigned, n_buckets, exchange.hash_bucket_fn("cluster_id", n_buckets)
    )
    return exchange.group_map(parts, dedup_cluster, empty)

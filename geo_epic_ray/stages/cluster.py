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


def _min_k_ids(ds: rd.Dataset, id_col: str, vec_col: str, k: int) -> pd.DataFrame:
    """The k rows with smallest ids, found streaming: per-batch top-k then
    a bounded (k x #blocks) driver merge — no sort, no materialization."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(k, id_col)[[id_col, vec_col]]

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return parts.nsmallest(k, id_col)


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
    centroid_id, n, inertia) — stats from one final assignment pass."""
    init = _min_k_ids(ds, id_col, vec_col, k)
    centroids = np.stack(init[vec_col].to_numpy()).astype(np.float64)
    k = centroids.shape[0]  # corpus smaller than k
    d = centroids.shape[1]

    def assign_partial(cref):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            # squared euclidean via the expansion; argmin ties -> lowest id
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
            n = np.bincount(a, minlength=k)
            return pd.DataFrame(
                {
                    "centroid_id": np.arange(k, dtype=np.int64),
                    "n": n.astype(np.int64),
                    "sse": np.bincount(a, weights=sse, minlength=k),
                    "sums": [row.tobytes() for row in sums],
                }
            )

        return f

    stats = None
    for _ in range(n_iter):
        cref = ray.put(centroids)
        parts = ds.map_batches(
            assign_partial(cref), batch_format="pandas"
        ).to_pandas()  # bounded: k rows per block
        sums = np.zeros((k, d))
        gb = parts.groupby("centroid_id", sort=True)
        n = gb["n"].sum().to_numpy()
        sse = gb["sse"].sum().to_numpy()
        for cid, grp in gb:
            sums[cid] = np.stack(
                [np.frombuffer(s, dtype=np.float64) for s in grp.sums]
            ).sum(axis=0)
        nonempty = n > 0
        centroids = np.where(
            nonempty[:, None], sums / np.maximum(n, 1)[:, None], centroids
        )
        stats = pd.DataFrame(
            {"centroid_id": np.arange(k, dtype=np.int64), "n": n, "inertia": sse}
        )
    return centroids, stats

"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: exact brute-force cosine top-k — each batch computes a
  numpy matmul against the broadcast, L2-normalized query matrix, emits
  its per-batch top-k, and a tiny grouped merge keeps the global top-k
  per query. No full-dataset materialization; the shuffle carries only
  batch_count * k rows per query.
- ``ivf_partition`` + ``ivf_topk_partitioned``: the scale path — vectors
  are PHYSICALLY partitioned by nearest centroid through the task
  exchange (one object-store cell per centroid; at deployment scale the
  same scatter writes one parquet directory per cell), and a query scans
  ONLY its ``nprobe`` nearest cells. nprobe prunes IO, not just compute —
  the round-2 ``ivf_topk`` (kept for comparison) assigned centroids
  inside a full scan, so every query still read the whole corpus.
- ``ivf_topk``: the scan-all variant (compute pruning only). Prefer the
  partitioned form; this stays as the one-shot path when the corpus is
  read once anyway and building cells would cost the same full exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
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


def _lloyd(
    x: np.ndarray, k: int, iters: int, rng: np.random.Generator,
    *, spherical: bool,
) -> np.ndarray:
    """Shared Lloyd loop (driver-side samples only): ``spherical`` uses
    argmax-dot assignment + renormalized centroids (IVF coarse
    quantizer); plain mode uses L2 argmin (PQ subspace codebooks).
    Empty clusters keep their previous centroid."""
    c = x[rng.choice(x.shape[0], size=min(k, x.shape[0]), replace=False)].copy()
    for _ in range(iters):
        if spherical:
            assign = np.argmax(x @ c.T, axis=1)
        else:
            assign = np.argmin(
                -2.0 * x @ c.T + (c**2).sum(axis=1)[None, :], axis=1
            )
        for j in range(c.shape[0]):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        if spherical:
            c = _normalize(c)
    return c


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Plain k-means on a driver-side sample (spherical: normalized)."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    return _lloyd(x, n_centroids, iters, np.random.default_rng(seed), spherical=True)


def ivf_partition(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    emb_col: str = "embedding",
) -> list[list[ray.ObjectRef]]:
    """Physically bucket the vector table by nearest centroid: one task
    exchange (streaming scatter), one object-store cell per centroid.
    This is the index BUILD — paid once, reused by every query; a search
    then reads only its probed cells' partitions. At deployment scale the
    same layout is one parquet directory per cell (resumable, prunable
    reads); in-session the cells live in the object store and spill."""
    from . import exchange

    c = _normalize(np.asarray(centroids, dtype=np.float64))

    def assign_bucket(tbl: pa.Table) -> np.ndarray:
        emb = _normalize(
            np.stack(tbl.column(emb_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        return np.argmax(emb @ c.T, axis=1).astype(np.int64)

    assign_bucket.wants_arrow = True
    assign_bucket.needs_cols = [emb_col]
    return exchange.scatter(ds, c.shape[0], assign_bucket)


@ray.remote
def _ivf_scan_cell(qm: np.ndarray, qids: np.ndarray, k: int, emb_col: str,
                   id_col: str, *parts: pa.Table) -> pd.DataFrame:
    """Scan ONE centroid cell for the queries probing it; emit each
    query's cell-local top-k (ties broken by lowest id)."""
    b = pa.concat_tables(parts, promote_options="permissive").to_pandas()
    emb = _normalize(np.stack(b[emb_col].to_numpy()).astype(np.float64))
    ids = b[id_col].to_numpy()
    sims = emb @ qm.T  # (n, m)
    frames = []
    for j, qi in enumerate(qids):
        s = sims[:, j]
        order = np.lexsort((ids, -s))[:k]
        frames.append(
            pd.DataFrame({"query_id": int(qi), id_col: ids[order], "cosine": s[order]})
        )
    return pd.concat(frames, ignore_index=True)


def ivf_topk_partitioned(
    ds_or_parts: rd.Dataset | list[list[ray.ObjectRef]],
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF search over centroid-partitioned cells: each query scans only
    its ``nprobe`` nearest cells (IO pruning — unprobed cells' partitions
    are never touched). Pass a Dataset to build the cells inline, or the
    ``ivf_partition`` result to reuse an existing index across calls.

    Returns a driver DataFrame (query_id, id_col, cosine, rank) — the
    merge is nq x nprobe x k rows, bounded by construction."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    parts = (
        ds_or_parts
        if isinstance(ds_or_parts, list)
        else ivf_partition(ds_or_parts, c, emb_col=emb_col)
    )
    probe = np.argsort(-(qm @ c.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    # fetch k + #excludable per cell so dropping excluded ids at the
    # merge can never leave a query short
    kk = k + (len(exclude_ids) if exclude_ids is not None else 0)
    futs = []
    for b in range(c.shape[0]):
        qids = np.flatnonzero((probe == b).any(axis=1))
        if qids.size and parts[b]:
            futs.append(
                _ivf_scan_cell.remote(
                    qm[qids], qids, kk, emb_col, id_col, *parts[b]
                )
            )
    if not futs:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype=np.int64),
             id_col: pd.Series([], dtype=np.int64),
             "cosine": pd.Series([], dtype=np.float64),
             "rank": pd.Series([], dtype=np.int64)}
        )
    m = pd.concat(ray.get(futs), ignore_index=True)
    if exclude_ids is not None:
        m = m[~m[id_col].isin(exclude_ids)]
    m = m.sort_values(["query_id", "cosine", id_col],
                      ascending=[True, False, True], kind="stable")
    m = m.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    m["rank"] = m.groupby("query_id").cumcount() + 1
    return m


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


def train_pq_codebooks(
    sample: np.ndarray, m: int = 4, ks: int = 16, iters: int = 10, seed: int = 9
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011): plain
    Lloyd k-means per SUBSPACE over an L2-normalized driver-side sample.
    Returns (m, ks, D/m) float64."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n, D = x.shape
    if D % m:
        raise ValueError(f"dim {D} not divisible by m={m}")
    d = D // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, d))
    for s in range(m):
        c = _lloyd(x[:, s * d : (s + 1) * d], ks, iters, rng, spherical=False)
        books[s, : c.shape[0]] = c
        if c.shape[0] < ks:  # tiny sample: repeat last centroid as filler
            books[s, c.shape[0]:] = c[-1]
    return books


def pq_encode(
    ds: rd.Dataset,
    books: np.ndarray,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Encode vectors to m uint8 codes each (the stored index at scale:
    m bytes/vector instead of 4D). Codebooks broadcast once via ray.put."""
    m, ks, d = books.shape
    bref = ray.put(books)

    def enc(b: pd.DataFrame) -> pd.DataFrame:
        bk = ray.get(bref)
        e = _normalize(np.stack(b[emb_col].to_numpy()).astype(np.float64))
        codes = np.empty((len(b), m), dtype=np.uint8)
        for s in range(m):
            xs = e[:, s * d : (s + 1) * d]
            d2 = -2.0 * xs @ bk[s].T + (bk[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "codes": list(codes)})

    return ds.map_batches(enc, batch_format="pandas")


def pq_adc_candidates(
    codes: rd.Dataset,
    books: np.ndarray,
    query: np.ndarray,
    r: int,
    *,
    id_col: str = "vec_id",
    exclude_ids: np.ndarray | None = None,
) -> np.ndarray:
    """Asymmetric-distance scan over the CODES ONLY (raw vectors never
    read): per batch, score = sum_m LUT[m, code_m] with LUT = the query
    subvector · codebook products; per-batch top-r partials merge to the
    global top-r candidate ids on the driver (r rows, not the corpus)."""
    m, ks, d = books.shape
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    lut = np.stack([q[s * d : (s + 1) * d] @ books[s].T for s in range(m)])
    lref = ray.put((lut, exclude_ids))

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        lt, excl = ray.get(lref)
        c = np.stack(b.codes.to_numpy())
        score = np.zeros(len(b))
        for s in range(m):
            score += lt[s][c[:, s]]
        ids = b[id_col].to_numpy()
        if excl is not None:
            keep = ~np.isin(ids, excl)
            ids, score = ids[keep], score[keep]
        order = np.lexsort((ids, -score))[:r]
        return pd.DataFrame({id_col: ids[order], "adc": score[order]})

    parts = codes.map_batches(scan, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["adc", id_col], ascending=[False, True], kind="stable")
    return parts[id_col].to_numpy()[:r]


def pq_topk_rerank(
    ds: rd.Dataset,
    codes: rd.Dataset,
    books: np.ndarray,
    query: np.ndarray,
    k: int,
    r: int,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """PQ serve path: ADC scan over codes -> top-r candidate ids ->
    fetch ONLY those candidates' raw vectors (broadcast id set, filtered
    scan) -> exact cosine rerank -> top-k (lowest-id ties)."""
    cand = pq_adc_candidates(
        codes, books, query, r, id_col=id_col, exclude_ids=exclude_ids
    )
    cref = ray.put(set(int(x) for x in cand))

    def fetch(b: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cref)
        return b[b[id_col].isin(cs)]

    got = ds.map_batches(fetch, batch_format="pandas").to_pandas()
    e = _normalize(np.stack(got[emb_col].to_numpy()).astype(np.float64))
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    sims = e @ q
    got = pd.DataFrame({id_col: got[id_col].to_numpy(), "cosine": sims})
    got = got.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
    got["rank"] = np.arange(1, len(got) + 1)
    return got.reset_index(drop=True)

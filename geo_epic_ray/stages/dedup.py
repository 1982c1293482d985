"""Deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only has exact key dedup (drop_duplicates,
geoEpic/io/inputs.py:249, geoEpic/utils/misc.py:89); the near-dup
operators are the large-scale-training-data extensions this engine adds
as first-class components. All signature computation is vectorized
(concatenated shingle arrays + ``np.minimum.reduceat`` per permutation —
no per-row Python in the hot path); the LSH band explode -> groupby is
the standard shuffle-by-bucket scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_P61 = (1 << 61) - 1  # Mersenne prime for universal hashing


_SHINGLE_W = None


def _hash_bytes_rolling(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Char k-gram (shingle) hashes of each text, concatenated.

    Returns (hashes: uint64[total], offsets: int64[n+1]) where
    hashes[offsets[i]:offsets[i+1]] are doc i's UNIQUE shingle hashes.
    Position-invariant: each window is a dot product of its byte codes
    with fixed random odd weights (sliding_window_view, one matmul/doc).
    """
    global _SHINGLE_W
    if _SHINGLE_W is None or _SHINGLE_W.size < k:
        rng = np.random.default_rng(1234)
        _SHINGLE_W = rng.integers(1, 1 << 62, size=max(k, 16), dtype=np.uint64) | np.uint64(1)
    w = _SHINGLE_W[:k]
    out = []
    offsets = [0]
    for t in texts:
        codes = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        n = codes.size
        if n < k:
            h = np.array([codes.sum() + np.uint64(n)], dtype=np.uint64)
        else:
            win = np.lib.stride_tricks.sliding_window_view(codes, k)
            h = (win * w[None, :]).sum(axis=1, dtype=np.uint64)
            h = (h ^ (h >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)
        out.append(np.unique(h))
        offsets.append(offsets[-1] + out[-1].size)
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.uint64),
        np.asarray(offsets, dtype=np.int64),
    )


def minhash_signatures(
    texts: list[str], num_perm: int = 64, shingle_k: int = 5, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures, vectorized: one
    universal-hash + ``minimum.reduceat`` pass per permutation."""
    hashes, offsets = _hash_bytes_rolling(texts, shingle_k)
    n = len(texts)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if hashes.size == 0:
        return sig
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _P61, size=num_perm, dtype=np.uint64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > offsets[:-1]
    h61 = hashes % np.uint64(_P61)
    for i in range(num_perm):
        hv = (a[i] * h61 + b[i]) % np.uint64(_P61)
        mins = np.minimum.reduceat(hv, np.minimum(starts, hv.size - 1))
        sig[nonempty, i] = mins[nonempty]
    return sig


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 band keys: hash of each band's rows."""
    n, num_perm = sig.shape
    rows = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for bband in range(bands):
        chunk = sig[:, bband * rows : (bband + 1) * rows]
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(rows):
            acc = acc * np.uint64(1099511628211) + chunk[:, j]
        out[:, bband] = acc
    return out


def minhash_lsh_buckets(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> rd.Dataset:
    """Explode each doc into (band_id, band_hash, id) rows — groupby
    (band_id, band_hash) downstream yields LSH candidate buckets."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sig = minhash_signatures(batch[text_col].tolist(), num_perm, shingle_k)
        bh = band_hashes(sig, bands)
        n = len(batch)
        return pd.DataFrame(
            {
                "band_id": np.tile(np.arange(bands), n),
                "band_hash": bh.reshape(-1).astype("int64"),
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
            }
        )

    return ds.map_batches(explode, batch_format="pandas")


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard — the verify step after LSH."""
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(
    ds: rd.Dataset,
    texts_by_id: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> rd.Dataset:
    """Candidate pairs from LSH buckets, verified with exact Jaccard.

    ``texts_by_id`` is a broadcastable small-side lookup for the verify
    step (gate-scale). At 100 TB the verify joins text back by
    hash-partitioned id instead of a broadcast — same bucket pipeline.
    """
    import ray

    lookup_ref = ray.put(texts_by_id)
    buckets = minhash_lsh_buckets(ds, text_col, id_col, num_perm, bands, shingle_k)

    # Composite bucket key so the whole pipeline shuffles ONE int64 column.
    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        bh = b["band_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        bid = b["band_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        b["bkey"] = (bh ^ (bid * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        return b[["bkey", id_col]]

    # Materialize the (bkey, id) table once — it is tiny (bands ints per
    # doc) and is consumed twice (count pass + pair pass); without this the
    # signature computation re-executes per consumer.
    kb = buckets.map_batches(keyed, batch_format="pandas").materialize()

    # Prefilter: only buckets holding >= 2 docs can produce pairs. Partial
    # counts per batch are combined driver-side — a Ray sort-based groupby
    # over ~n_docs*bands mostly-unique keys costs tens of seconds for what
    # is a small merge (measured: 65s -> ~4s at sf0.1 end to end).
    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("bkey", as_index=False).size()
        return g.rename(columns={"size": "pn"})

    partials = kb.map_batches(partial_counts, batch_format="pandas").to_pandas()
    totals = partials.groupby("bkey", as_index=False)["pn"].sum()
    hot_keys = np.sort(totals.loc[totals.pn >= 2, "bkey"].to_numpy())
    hot_ref = ray.put(hot_keys)

    def keep_hot(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(hot_ref)
        if keys.size == 0:
            return b.iloc[0:0]
        pos = np.clip(np.searchsorted(keys, b.bkey.to_numpy()), 0, keys.size - 1)
        return b[keys[pos] == b.bkey.to_numpy()]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = (
        kb.map_batches(keep_hot, batch_format="pandas")
        .groupby("bkey")
        .map_groups(pairs, batch_format="pandas")
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        """Exact-Jaccard check with a per-worker shingle-set memo — each
        doc participates in many candidate pairs, so sets are built once
        per worker, not once per pair."""
        if not len(batch):
            return batch.assign(jaccard=pd.Series(dtype=float))
        from ..state.worker_cache import get_or_build

        texts = ray.get(lookup_ref)
        memo = get_or_build(f"shingles:{lookup_ref.hex()}:{shingle_k}", dict)

        def sset(i):
            s = memo.get(i)
            if s is None:
                t = texts[i]
                s = {t[j : j + shingle_k] for j in range(max(1, len(t) - shingle_k + 1))}
                memo[i] = s
            return s

        batch = batch.drop_duplicates(["id_a", "id_b"])
        j = []
        for a, b in zip(batch.id_a, batch.id_b):
            sa, sb = sset(a), sset(b)
            j.append(len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0)
        batch = batch.assign(jaccard=j)
        return batch[batch.jaccard >= threshold]

    verified = cand.map_batches(verify, batch_format="pandas")
    # The surviving set is small by construction (true near-dups only);
    # final cross-band dedup is a driver-side drop_duplicates. At corpus
    # scale this last step becomes a hash-partitioned groupby instead.
    out = verified.to_pandas()
    return out.drop_duplicates(["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)


# --- SimHash ----------------------------------------------------------------


def _stable_token_hash(tok: str, seed: int) -> int:
    """Deterministic 64-bit token hash (Python's builtin hash() is
    per-process randomized — never use it in distributed stages)."""
    import zlib

    b = tok.encode("utf-8")
    lo = zlib.crc32(b, seed)
    hi = zlib.crc32(b, seed ^ 0x5BD1E995)
    return (hi << 32) | lo


def simhash64(texts: list[str], seed: int = 11) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, vectorized per batch."""
    toks_per_doc = [t.split() for t in texts]
    counts = np.array([len(t) for t in toks_per_doc])
    all_tokens = [tok for toks in toks_per_doc for tok in toks]
    if not all_tokens:
        return np.zeros(len(texts), dtype=np.uint64)
    th = np.array(
        [_stable_token_hash(tok, seed) for tok in all_tokens], dtype=np.uint64
    )
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    ) * 2 - 1
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = np.zeros(len(texts), dtype=np.uint64)
    nonempty = counts > 0
    sums = np.add.reduceat(bits, np.minimum(offsets, bits.shape[0] - 1), axis=0)
    sig = (sums > 0).astype(np.uint64)
    vals = (sig << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals[nonempty]
    return out


def simhash_fingerprints(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "simhash": simhash64(batch[text_col].tolist()).astype("int64"),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


# --- embedding cosine near-dup ----------------------------------------------


def embedding_dup_pairs(
    ds: rd.Dataset,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    ref_matrix: np.ndarray | None = None,
    ref_ids: np.ndarray | None = None,
) -> rd.Dataset:
    """Pairs (id_a < id_b) with cosine similarity >= threshold, each batch
    scored against the broadcast (normalized) reference matrix — the
    brute-force baseline; the scale path LSH-buckets by random hyperplane
    sign bytes first."""
    import ray

    ref = ray.put((ref_matrix, ref_ids))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m, ids = ray.get(ref)
        emb = np.stack(batch[emb_col].to_numpy())
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = emb @ m.T
        bi, ri = np.nonzero(sims >= threshold)
        ia = batch[id_col].to_numpy()[bi]
        ib = ids[ri]
        keep = ia < ib
        return pd.DataFrame(
            {
                "id_a": ia[keep],
                "id_b": ib[keep],
                "cosine": sims[bi, ri][keep].astype(float),
            }
        )

    return ds.map_batches(score, batch_format="pandas")

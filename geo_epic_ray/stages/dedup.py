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


_CHAR_W = None


def char_rolling_hashes(text: str, k: int) -> np.ndarray:
    """Raw positional rolling k-gram hash array of one text's utf-32
    codepoints — the shared kernel under ``char_shingle_hashes`` (which
    sorts/uniques it) and winnowing (which window-minimizes it; any change
    here changes every persisted winnowing fingerprint). A text shorter
    than k contributes its whole string as the single shingle (SQL
    ``substr`` semantics)."""
    global _CHAR_W
    if _CHAR_W is None or _CHAR_W.size < k:
        rng = np.random.default_rng(4321)
        _CHAR_W = rng.integers(1, 1 << 62, size=max(k, 16), dtype=np.uint64) | np.uint64(1)
    w = _CHAR_W[:k]
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = codes.size
    if n < k:
        return np.array(
            [(codes * w[:n]).sum(dtype=np.uint64) + np.uint64(n)], dtype=np.uint64
        )
    win = np.lib.stride_tricks.sliding_window_view(codes, k)
    h = (win * w[None, :]).sum(axis=1, dtype=np.uint64)
    return (h ^ (h >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)


def char_shingle_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-UNIQUE hashes of the CHAR k-grams (utf-32 codepoints
    — the char analogue of ``_hash_bytes_rolling``). Returns
    (hashes, offsets) with hashes[offsets[i]:offsets[i+1]] = doc i's
    shingle hashes.

    Set operations on these hashes equal set operations on the string
    shingles up to 64-bit hash collisions (~n^2/2^64 — negligible), which
    turns the per-pair verify into sorted-array intersections."""
    out = []
    offsets = [0]
    for t in texts:
        out.append(np.unique(char_rolling_hashes(t, k)))
        offsets.append(offsets[-1] + out[-1].size)
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.uint64),
        np.asarray(offsets, dtype=np.int64),
    )


def pair_bucket_keys(id_a: np.ndarray, id_b: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket of a candidate pair by hashing BOTH member ids
    — one shared formula for every grouped pair-dedup/verify pass (all
    duplicates of a pair land in one bucket regardless of which band/
    chunk/fingerprint emitted them)."""
    h = id_a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ id_b.astype(
        np.uint64
    ) * np.uint64(0xC2B2AE3D27D4EB4F)
    return (h % np.uint64(n_buckets)).astype("int64")


def jaccard_sorted(ua: np.ndarray, ub: np.ndarray) -> float:
    """Jaccard of two sorted-unique hash arrays (one merge pass)."""
    inter = np.intersect1d(ua, ub, assume_unique=True).size
    union = ua.size + ub.size - inter
    return inter / union if union else 1.0


def bucketed_pairs(
    kb: rd.Dataset, key_col: str, id_col: str, n_buckets: int = 32
) -> rd.Dataset:
    """Candidate pairs (id_a < id_b) from (bucket_key, id) rows, fully
    distributed: shuffle by hash(key) % n_buckets (ONE small-column
    exchange), then a C-speed pandas groupby inside each bucket emits the
    per-key pairs — the >= 2-member prefilter falls out of the groupby for
    free, with no driver-side merge. Degenerate hot keys (everything
    identical) still cost O(m^2) pairs — salt upstream if the key
    histogram is pathological."""

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key_col, id_col]].copy()
        h = b[key_col].to_numpy(dtype=np.int64).view(np.uint64)
        b["__bucket"] = (h % np.uint64(n_buckets)).astype("int64")
        return b

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(key_col):
            ids = np.sort(grp[id_col].unique())
            if ids.size < 2:
                continue
            ia, ib = np.triu_indices(ids.size, k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        cand = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        return cand.drop_duplicates(["id_a", "id_b"])

    return (
        kb.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )


def pair_payload_verify(
    cand: rd.Dataset,
    payload: rd.Dataset,
    id_col: str,
    verify_bucket_fn,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Verify candidate pairs against a per-id payload WITHOUT broadcasting
    the payload: explode each pair into two member rows, hash-partitioned
    rejoin of the payload by id (bucket_join — both sides stream), then
    regroup by pair and run ``verify_bucket_fn`` per pair-bucket. Duplicate
    pairs (e.g. from different LSH bands/tables) land in the same
    pair-bucket, so the verify fn dedups them there — no driver pass."""
    from .joins import bucket_join

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id_a"].to_numpy()
        bb = b["id_b"].to_numpy()
        return pd.DataFrame(
            {
                id_col: np.concatenate([a, bb]),
                "id_a": np.concatenate([a, a]),
                "id_b": np.concatenate([bb, bb]),
            }
        )

    members = cand.map_batches(explode, batch_format="pandas")
    joined = bucket_join(members, payload, on=id_col, n_buckets=n_buckets)

    def pbucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__pb"] = pair_bucket_keys(
            b["id_a"].to_numpy(), b["id_b"].to_numpy(), n_buckets
        )
        return b

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__pb")
        # a pair is verifiable only if BOTH member payload rows joined
        # (a caller-supplied payload subset may lack one side) — drop the
        # incomplete pair's rows instead of KeyError-ing the whole job
        present = set(g[id_col])
        ok = g["id_a"].isin(present).to_numpy() & g["id_b"].isin(present).to_numpy()
        return verify_bucket_fn(g[ok] if not ok.all() else g)

    return (
        joined.map_batches(pbucket, batch_format="pandas")
        .groupby("__pb")
        .map_groups(run, batch_format="pandas")
    )


def minhash_dedup_pairs(
    ds: rd.Dataset,
    texts: rd.Dataset | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Near-dup pairs via MinHash+LSH, verified with exact char-k-gram
    Jaccard — fully distributed, no driver-side merge and no full-corpus
    broadcast anywhere:

    1. vectorized signatures -> (band key, id) explode;
    2. candidate pairs per band bucket (``bucketed_pairs``: one hashed
       shuffle of two int64 columns, C-speed groupby per bucket — the
       >= 2-member prefilter is implicit);
    3. verify: pairs explode into member rows, text payload rejoined by
       hash-partitioned id (``bucket_join`` — both sides stream), regroup
       by pair; cross-band duplicates of a pair land in the same
       pair-bucket and are verified once. Shingle-hash arrays are built
       once per doc per bucket, intersections are sorted-array merges.

    ``texts`` supplies the (id, text) payload for the verify step and
    defaults to ``ds`` itself. Returns a Dataset (id_a, id_b, jaccard)
    with jaccard >= threshold, id_a < id_b.
    """
    if texts is None:
        texts = ds
    buckets = minhash_lsh_buckets(ds, text_col, id_col, num_perm, bands, shingle_k)

    # Composite bucket key so the whole pipeline shuffles ONE int64 column.
    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        bh = b["band_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        bid = b["band_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        b["bkey"] = (bh ^ (bid * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        return b[["bkey", id_col]]

    kb = buckets.map_batches(keyed, batch_format="pandas")
    cand = bucketed_pairs(kb, "bkey", id_col, n_buckets=n_buckets)

    # Precompute each doc's sorted-unique shingle-hash array ONCE (a doc
    # participates in many pairs across many verify buckets — shipping the
    # hashes instead of the text avoids rebuilding shingles per bucket).
    def to_shingles(b: pd.DataFrame) -> pd.DataFrame:
        hs, offs = char_shingle_hashes(b[text_col].tolist(), shingle_k)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "sh_bytes": [
                    hs[offs[i] : offs[i + 1]].tobytes() for i in range(len(b))
                ],
            }
        )

    payload = texts.map_batches(to_shingles, batch_format="pandas")

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
                 "jaccard": np.empty(0, float)}
            )
        pairs = g[["id_a", "id_b"]].drop_duplicates()
        slice_of = {
            i: np.frombuffer(bb, dtype=np.uint64)
            for i, bb in zip(g[id_col], g["sh_bytes"])
        }
        jac = np.fromiter(
            (
                jaccard_sorted(slice_of[a], slice_of[b])
                for a, b in zip(pairs.id_a, pairs.id_b)
            ),
            dtype=float,
            count=len(pairs),
        )
        out = pairs.assign(jaccard=jac)
        return out[out.jaccard >= threshold]

    return pair_payload_verify(cand, payload, id_col, verify_bucket, n_buckets)


# --- SimHash ----------------------------------------------------------------


def _token_hashes(tokens: list[str], seed: int) -> np.ndarray:
    """Deterministic 64-bit token hashes, computed in ONE vectorized pass
    (polars hash_rows — C speed, process-independent; Python's builtin
    hash() is per-process randomized and must never appear in distributed
    stages)."""
    import polars as pl

    return (
        pl.from_arrow(pa.table({"t": pa.array(tokens, type=pa.string())}))
        .hash_rows(seed=seed)
        .to_numpy()
        .astype(np.uint64)
    )


def simhash64(texts: list[str], seed: int = 11) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, vectorized per batch."""
    toks_per_doc = [t.split() for t in texts]
    counts = np.array([len(t) for t in toks_per_doc])
    all_tokens = [tok for toks in toks_per_doc for tok in toks]
    if not all_tokens:
        return np.zeros(len(texts), dtype=np.uint64)
    th = _token_hashes(all_tokens, seed)
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


def simhash_dup_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
    seed: int = 11,
    n_buckets: int = 32,
) -> rd.Dataset:
    """SimHash near-dup pairs within Hamming distance ``max_hamming`` —
    the Manku/Jain/Sarma (WWW'07) chunk trick, distributed: split each
    64-bit simhash into ``n_chunks`` equal bit chunks; any pair differing
    in <= n_chunks - 1 bits shares at least one EXACT chunk (pigeonhole),
    so exact-match chunk buckets generate ALL candidates (no recall loss
    for max_hamming < n_chunks); verify = popcount(xor) <= max_hamming,
    computed from simhashes carried in the bucket rows — no payload
    rejoin needed. Returns (id_a, id_b, hamming)."""
    if max_hamming >= n_chunks:
        raise ValueError("exact recall requires max_hamming < n_chunks")
    bits = 64 // n_chunks
    chunk_mask = np.uint64((1 << bits) - 1)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(batch[text_col].tolist(), seed)
        ids = batch[id_col].to_numpy()
        frames = []
        for c in range(n_chunks):
            chunk = (sh >> np.uint64(c * bits)) & chunk_mask
            salt = np.uint64(((c + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            frames.append(
                pd.DataFrame(
                    {
                        "ckey": (chunk ^ salt).view(np.int64),
                        id_col: ids,
                        "simhash": sh.view(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    kb = ds.map_batches(explode, batch_format="pandas")

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (
            b["ckey"].to_numpy().view(np.uint64) % np.uint64(n_buckets)
        ).astype("int64")
        return b

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("ckey"):
            u = grp.drop_duplicates(id_col).sort_values(id_col)
            if len(u) < 2:
                continue
            ids = u[id_col].to_numpy()
            sh = u["simhash"].to_numpy().view(np.uint64)
            ia, ib = np.triu_indices(ids.size, k=1)
            x = sh[ia] ^ sh[ib]
            ham = np.zeros(x.size, dtype=np.int64)
            while True:  # popcount via bit-clearing on the nonzero lanes
                nz = x != 0
                if not nz.any():
                    break
                ham[nz] += 1
                x[nz] &= x[nz] - np.uint64(1)
            keep = ham <= max_hamming
            out.append(
                pd.DataFrame(
                    {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                     "hamming": ham[keep]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
                 "hamming": np.empty(0, np.int64)}
            )
        return pd.concat(out, ignore_index=True).drop_duplicates(["id_a", "id_b"])

    cand = (
        kb.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # cross-chunk duplicates of a pair live in different chunk buckets:
    # one grouped pass by pair hash dedups them distributed
    def pbucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__pb"] = pair_bucket_keys(
            b["id_a"].to_numpy(), b["id_b"].to_numpy(), n_buckets
        )
        return b

    return (
        cand.map_batches(pbucket, batch_format="pandas")
        .groupby("__pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns="__pb"),
            batch_format="pandas",
        )
    )


# --- embedding cosine near-dup ----------------------------------------------


def embedding_dup_pairs_bruteforce(
    ds: rd.Dataset,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    ref_matrix: np.ndarray | None = None,
    ref_ids: np.ndarray | None = None,
) -> rd.Dataset:
    """Pairs (id_a < id_b) with cosine similarity >= threshold, each batch
    scored against the broadcast (normalized) reference matrix — the exact
    O(N^2) baseline for small N and the recall oracle for the LSH path
    below. NOT the scale path: the reference matrix is the whole dataset."""
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


def embedding_dup_pairs(
    ds: rd.Dataset,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_tables: int = 8,
    n_planes: int = 12,
    dim: int | None = None,
    seed: int = 21,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Embedding near-dup pairs via random-hyperplane (cosine) LSH
    [Charikar 2002]: each vector gets one sign-bit code per table
    (``n_planes`` hyperplanes -> a 2^n_planes-bucket code); vectors
    sharing a (table, code) bucket become candidates; candidates are
    verified with the exact cosine, payload rejoined by hash-partitioned
    id — no full-matrix broadcast, no all-pairs scan.

    Recall per true pair at angle theta = 1 - (1 - (1-theta/pi)^n_planes)
    ^n_tables: for cosine >= 0.95 the defaults give > 0.999; LOWER
    thresholds need fewer planes / more tables (and genuinely random data
    near the threshold degrades toward brute force — LSH is a near-dup
    tool, not a mid-similarity join). Candidate volume scales as
    n_tables * sum_buckets(m^2), so raise n_planes as the corpus grows.
    """
    first = dim
    if first is None:
        first = len(ds.take(1)[0][emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, first, n_planes))

    def codes(batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        ids = batch[id_col].to_numpy()
        frames = []
        pow2 = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))[None, :]
        for t in range(n_tables):
            bits = (emb @ planes[t]) > 0
            code = (bits.astype(np.uint64) * pow2).sum(axis=1, dtype=np.uint64)
            salt = np.uint64(((t + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            key = (code ^ salt).view(np.int64)
            frames.append(pd.DataFrame({"ckey": key, id_col: ids}))
        return pd.concat(frames, ignore_index=True)

    kb = ds.map_batches(codes, batch_format="pandas")
    cand = bucketed_pairs(kb, "ckey", id_col, n_buckets=n_buckets)

    # payload: the vector serialized to bytes (fixed dtype) so it unions
    # cleanly through the bucketed join
    def to_bytes(b: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(b[emb_col].to_numpy()).astype(np.float64)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "emb_bytes": [v.tobytes() for v in emb]}
        )

    payload = ds.map_batches(to_bytes, batch_format="pandas")

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
                 "cosine": np.empty(0, float)}
            )
        pairs = g[["id_a", "id_b"]].drop_duplicates()
        vec = {
            i: np.frombuffer(bb, dtype=np.float64)
            for i, bb in zip(g[id_col], g["emb_bytes"])
        }
        a_mat = np.stack([vec[i] for i in pairs.id_a])
        b_mat = np.stack([vec[i] for i in pairs.id_b])
        cos = np.einsum("ij,ij->i", a_mat, b_mat)
        out = pairs.assign(cosine=cos)
        return out[out.cosine >= threshold]

    return pair_payload_verify(cand, payload, id_col, verify_bucket, n_buckets)


def blocked_pair_edges(
    ds: rd.Dataset,
    key_cols: list[str],
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.2,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Near-dup edges from EQUALITY blocking (one block key per doc, e.g.
    (n_chars, lang)) in ONE shuffle: rows (id, keys, text) hash-bucket by
    block key; inside each bucket a groupby over the exact key tuple
    generates all pairs and verifies char-k-gram Jaccard in place —
    shingle sets built once per doc per bucket, no payload rejoin needed
    (contrast minhash_dedup_pairs, where a doc appears in many bands and
    the rejoin earns its shuffle). Salt skew-prone block keys upstream
    (stages/partition.py). Returns (id_a, id_b, jaccard), id_a < id_b."""

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(b), dtype=np.uint64)
        for k in key_cols:
            h = h * np.uint64(1099511628211) + pd.util.hash_array(
                b[k].to_numpy()
            ).astype(np.uint64)
        out = b[[id_col, text_col, *key_cols]].copy()
        out["__bucket"] = (h % np.uint64(n_buckets)).astype("int64")
        return out

    empty = pd.DataFrame(
        {
            "id_a": np.empty(0, np.int64),
            "id_b": np.empty(0, np.int64),
            "jaccard": np.empty(0, float),
        }
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        g = g.drop(columns="__bucket").reset_index(drop=True)
        hs, offs = char_shingle_hashes(g[text_col].tolist(), shingle_k)
        sets = [np.unique(hs[offs[i] : offs[i + 1]]) for i in range(len(g))]
        out_a, out_b, out_j = [], [], []
        for _, grp in g.groupby(key_cols):
            if len(grp) < 2:
                continue
            order = np.argsort(grp[id_col].to_numpy())
            pos = grp.index.to_numpy()[order]
            ids = grp[id_col].to_numpy()[order]
            for i in range(len(ids)):
                si = sets[pos[i]]
                for j in range(i + 1, len(ids)):
                    jac = jaccard_sorted(si, sets[pos[j]])
                    if jac >= threshold:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_j.append(jac)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.array(out_a, np.int64),
                "id_b": np.array(out_b, np.int64),
                "jaccard": np.array(out_j, float),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )

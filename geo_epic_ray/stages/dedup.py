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
import ray
import ray.data as rd

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
    permutation + ``minimum.reduceat`` pass per row of the signature.

    Permutations are multiply-add over the natural 2^64 ring (odd
    multiplier -> a bijection of the key space) followed by one xorshift
    mix — ~7x faster per pass than reduction mod a Mersenne prime, which
    priced the whole LSH pipeline: at 256 total permutations (banding +
    1-bit sketch) the modulo alone dominated signature time. The shingle
    hashes being permuted are already well-mixed 64-bit values, so the
    minima behave as independent draws per permutation."""
    hashes, offsets = _hash_bytes_rolling(texts, shingle_k)
    return minhash_from_hashes(hashes, offsets, num_perm, seed)


def minhash_from_hashes(
    hashes: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """MinHash signatures over a precomputed per-doc shingle-hash layout
    (hashes[offsets[i]:offsets[i+1]] = doc i's shingles) — lets one
    shingle pass feed several signature families (banding perms + the
    independent 1-bit-sketch perms share the pass instead of re-shingling
    the batch per call)."""
    n = offsets.size - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if hashes.size == 0:
        return sig
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > offsets[:-1]
    for i in range(num_perm):
        hv = a[i] * hashes + b[i]
        hv ^= hv >> np.uint64(33)
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


def sig_bits(sig: np.ndarray) -> np.ndarray:
    """1-bit minwise sketch (Li & König, CACM'11): the low bit of each
    permutation's minimum, packed into ``ceil(num_perm / 64)`` uint64
    words per doc. For a pair with Jaccard s, each bit matches with
    probability (1+s)/2, so popcount(~xor)/num_perm estimates (1+s)/2 —
    a bytes-per-doc similarity sketch cheap enough to ride the
    band-explode shuffle. Returns (n_docs, n_words) uint64."""
    n, num_perm = sig.shape
    n_words = (num_perm + 63) // 64
    out = np.zeros((n, n_words), dtype=np.uint64)
    for w in range(n_words):
        chunk = sig[:, 64 * w : 64 * (w + 1)]
        bits = (chunk & np.uint64(1)).astype(np.uint64)
        pow2 = (np.uint64(1) << np.arange(chunk.shape[1], dtype=np.uint64))[None, :]
        out[:, w] = (bits * pow2).sum(axis=1, dtype=np.uint64)
    return out


def minhash_lsh_buckets(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    sketch_bits: int = 0,
) -> rd.Dataset:
    """Explode each doc into (band_id, band_hash, id) rows — groupby
    (band_id, band_hash) downstream yields LSH candidate buckets. With
    ``sketch_bits`` > 0 each row also carries the doc's packed 1-bit
    minwise sketch (``sb0..sbK`` int64 words over ``sketch_bits``
    INDEPENDENT permutations — separate seed, so banding is untouched)
    for in-bucket candidate prefiltering."""
    n_words = (sketch_bits + 63) // 64

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        txts = batch[text_col].tolist()
        hashes, offsets = _hash_bytes_rolling(txts, shingle_k)  # one pass
        sig = minhash_from_hashes(hashes, offsets, num_perm, seed=7)
        bh = band_hashes(sig, bands)
        n = len(batch)
        out = {
            "band_id": np.tile(np.arange(bands), n),
            "band_hash": bh.reshape(-1).astype("int64"),
            id_col: np.repeat(batch[id_col].to_numpy(), bands),
        }
        if sketch_bits:
            sk = sig_bits(minhash_from_hashes(hashes, offsets, sketch_bits, seed=8))
            for w in range(n_words):
                out[f"sb{w}"] = np.repeat(sk[:, w].view(np.int64), bands)
        return pd.DataFrame(out)

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


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR): five constant passes over the
    array — no data-dependent boolean-indexing loop (whose per-iteration
    allocations dominate on hot buckets)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (
        (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    ).astype(np.int64)


def run_pairs(starts: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All ordered within-run index pairs (a < b by position) of a sorted
    array partitioned into runs. ``starts`` are the run start positions
    (first element 0), ``n`` the total length. Fully vectorized: per
    element, the count of later same-run elements, then offset arithmetic
    — no Python loop over runs (a bucket can hold ~n_docs tiny runs, and a
    per-run loop is the hot-path row loop this engine bans).

    Pair volume is sum(size^2) over runs — the caller owns the degenerate
    hot-key caveat (salt upstream if the key histogram is pathological)."""
    if n == 0 or starts.size == 0:
        e = np.empty(0, np.int64)
        return e, e
    ends = np.concatenate([starts[1:], [n]])
    sizes = ends - starts
    run_of = np.repeat(np.arange(starts.size), sizes)
    pos = np.arange(n, dtype=np.int64)
    counts = ends[run_of] - pos - 1  # later elements in my run
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    a = np.repeat(pos, counts)
    c0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
    b = np.arange(total, dtype=np.int64) - np.repeat(c0, counts) + a + 1
    return a, b


def keyed_id_pairs(
    keys: np.ndarray, ids: np.ndarray, max_pairs: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Candidate id pairs (id_a < id_b) from (bucket_key, id) rows: sort by
    (key, id), drop duplicate (key, id), pair up within equal-key runs.
    Returns (a_pos, b_pos, order-applied ids) — positions index into the
    returned deduped id array, so callers can also carry per-row payloads
    (apply the same order/dedup to the payload column).

    ``max_pairs`` bounds the run_pairs allocation: the exact pair count is
    known from the run lengths BEFORE anything quadratic is allocated, so
    a pathological key histogram raises a sized error instead of OOM-
    killing the worker (the r5 scale smoke lost a reduce task at 6.6 GB
    RSS to an unbudgeted candidate explosion)."""
    order = np.lexsort((ids, keys))
    k = keys[order]
    i = ids[order]
    dup = np.zeros(k.size, dtype=bool)
    if k.size > 1:
        dup[1:] = (k[1:] == k[:-1]) & (i[1:] == i[:-1])
    keep = ~dup
    k, i, order = k[keep], i[keep], order[keep]
    starts = (
        np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        if k.size
        else np.empty(0, np.int64)
    )
    if max_pairs is not None and k.size:
        runs = np.diff(np.r_[starts, k.size]).astype(np.int64)
        total = int((runs * (runs - 1) // 2).sum())
        if total > max_pairs:
            top = np.sort(runs)[-3:][::-1]
            raise ValueError(
                f"candidate-pair budget exceeded: {total:.3g} pairs in one "
                f"bucket (budget {max_pairs:.3g}); hottest key run sizes "
                f"{top.tolist()}. Raise the budget to accept the memory "
                f"cost explicitly, raise the similarity threshold (shorter "
                f"prefixes), pre-salt/block the key, or use a probabilistic "
                f"candidate stage (minhash_lsh_pairs / simhash)."
            )
    a, b = run_pairs(starts, k.size)
    return a, b, order


_DEFAULT_PAIR_BUDGET = 20_000_000


def pair_reduce_cpus(
    max_pairs: int | None, reduce_num_cpus: float | None
) -> float | None:
    """CPU claim for a pair-kernel reduce task. A caller who raises the
    distinct-pair budget consents to a bigger per-bucket resident set —
    so the reduce task must claim proportionally more CPU slots, which
    drops per-node reduce concurrency and keeps total heap bounded
    (claiming k of N slots bounds concurrent reducers at N/k). Sizing:
    ~90 B per distinct pair of transient (np.unique + lexsort scratch,
    measured 6.4 GB at ~7e7 pairs on the r5 5M smoke — which the kernel
    OOM-killed at 32-way concurrency before this existed) against Ray's
    per-slot heap share (node heap / num_cpus, ~4 GiB on the reference
    box). An explicit ``reduce_num_cpus`` always wins; the default
    budget keeps the plain 1-CPU claim."""
    if reduce_num_cpus is not None:
        return reduce_num_cpus
    if max_pairs is None or max_pairs <= 2 * _DEFAULT_PAIR_BUDGET:
        return None
    return float(min(8, max(2, round(max_pairs * 90 / (4 << 30)))))


def posting_pair_counts(
    starts: np.ndarray,
    n: int,
    de: np.ndarray,
    n_docs: int,
    max_distinct_pairs: int | None,
    hint: str,
    chunk_pairs: int = 8_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct within-run doc pairs of a posting array with their
    shared-shingle counts: returns (packed keys ``da * n_docs + db``,
    int64 counts), the exact input to a Jaccard verify.

    This is the bounded-memory form of ``run_pairs`` + ``np.unique``:
    posting-pair volume grows quadratically inside a hot equality block
    (the r5 1M/2M smoke measured 3.5e7 → 1.4e8 pairs/bucket for 2x docs),
    but the DISTINCT pair set it collapses to is what actually stays
    resident. Runs are processed in slices of ~``chunk_pairs`` pairs
    (never splitting a run — a pair's count accumulates across runs, and
    all of one run's pairs are distinct), partial (key, count) results
    compacted by sum whenever the accumulator passes 2x chunk size. The
    transient is O(chunk + hottest run); the resident set is checked
    against ``max_distinct_pairs`` at every compaction — a genuinely
    quadratic corpus (e.g. a fixed-length templated one where the block
    key does not discriminate) still refuses sized, now on the bound
    that matters, before the accumulator outgrows the budget."""
    e = np.empty(0, np.int64)
    if n == 0 or starts.size == 0:
        return e, e
    runs = np.diff(np.r_[starts, n]).astype(np.int64)
    c = runs * (runs - 1) // 2
    total = int(c.sum())
    if total == 0:
        return e, e

    def refuse(count: int, what: str) -> None:
        top = np.sort(runs)[-3:][::-1]
        raise ValueError(
            f"candidate-pair budget exceeded: {count:.3g} {what} in one "
            f"bucket (budget {max_distinct_pairs:.3g}); hottest key run "
            f"sizes {top.tolist()}. {hint}"
        )

    if total <= chunk_pairs:
        a, b = run_pairs(starts, n)
        key = de[a].astype(np.int64) * n_docs + de[b]
        uk, cnt = np.unique(key, return_counts=True)
        if max_distinct_pairs is not None and uk.size > max_distinct_pairs:
            refuse(uk.size, "distinct candidate pairs")
        return uk, cnt
    # a single run's pairs are all distinct, so the hottest run lower-
    # bounds the resident set — refuse before allocating anything
    if max_distinct_pairs is not None and int(c.max()) > max_distinct_pairs:
        refuse(int(c.max()), "pairs in the hottest run")
    cum = np.cumsum(c)
    nruns = starts.size
    acc_k: list[np.ndarray] = []
    acc_c: list[np.ndarray] = []
    acc_n = 0

    def compact() -> None:
        nonlocal acc_k, acc_c, acc_n
        keys = np.concatenate(acc_k)
        uk, inv = np.unique(keys, return_inverse=True)
        cnt = np.bincount(inv, weights=np.concatenate(acc_c)).astype(np.int64)
        if max_distinct_pairs is not None and uk.size > max_distinct_pairs:
            refuse(uk.size, "distinct candidate pairs")
        acc_k, acc_c, acc_n = [uk], [cnt], uk.size

    prev = 0
    done_pairs = 0
    while prev < nruns:
        r1 = int(np.searchsorted(cum, done_pairs + chunk_pairs, side="left"))
        r1 = max(r1, prev + 1)
        r1 = min(r1, nruns)
        e0 = int(starts[prev])
        e1 = int(starts[r1]) if r1 < nruns else n
        a, b = run_pairs(starts[prev:r1] - e0, e1 - e0)
        if a.size:
            key = de[e0 + a].astype(np.int64) * n_docs + de[e0 + b]
            uk, cnt = np.unique(key, return_counts=True)
            acc_k.append(uk)
            acc_c.append(cnt.astype(np.int64))
            acc_n += uk.size
            if acc_n > 2 * chunk_pairs:
                compact()
        done_pairs = int(cum[r1 - 1])
        prev = r1
    compact()
    return acc_k[0], acc_c[0]


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
    kb: rd.Dataset,
    key_col: str,
    id_col: str,
    n_buckets: int = 32,
    payload_cols: list[str] | None = None,
    pair_filter=None,
    max_pairs_per_bucket: int | None = None,
) -> rd.Dataset:
    """Candidate pairs (id_a < id_b) from (bucket_key, id) rows, fully
    distributed: shuffle by hash(key) % n_buckets (ONE small-column
    exchange), then a vectorized within-run pairing inside each bucket —
    the >= 2-member prefilter falls out of the run boundaries for free,
    with no driver-side merge. Degenerate hot keys (everything identical)
    still cost O(m^2) pairs — salt upstream if the key histogram is
    pathological, and set ``max_pairs_per_bucket`` so a pathological
    histogram raises a sized, actionable error (exact count from run
    lengths, computed BEFORE the quadratic allocation) instead of OOM-
    killing the reduce worker.

    ``payload_cols`` (int64 columns riding the key rows, e.g. the words of
    a packed similarity sketch) + ``pair_filter(cols_a, cols_b) -> bool
    mask`` (each argument a list of per-word 1-D gathers — 2-D row gathers
    fault pathologically on this kernel) prune pairs INSIDE the bucket,
    before any downstream explode/join touches them — at recall-heavy LSH
    settings the junk-candidate volume is ~1000x the true-pair volume and
    pruning after the fact pays for it in allocation traffic."""

    from . import exchange

    cols = [key_col, id_col] + list(payload_cols or [])

    def bucket_of(t: pa.Table) -> np.ndarray:
        h = t.column(key_col).to_numpy(zero_copy_only=False).view(np.uint64)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    bucket_of.wants_arrow = True
    bucket_of.needs_cols = [key_col]

    def pairs_in_bucket(g: pa.Table) -> pd.DataFrame:
        a, b, order = keyed_id_pairs(
            g.column(key_col).to_numpy(zero_copy_only=False),
            g.column(id_col).to_numpy(zero_copy_only=False),
            max_pairs=max_pairs_per_bucket,
        )
        if not a.size:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        ids = g.column(id_col).to_numpy(zero_copy_only=False)[order]
        if payload_cols and pair_filter is not None:
            pv = [
                g.column(c).to_numpy(zero_copy_only=False)[order]
                for c in payload_cols
            ]
            keep = pair_filter([v[a] for v in pv], [v[b] for v in pv])
            a, b = a[keep], b[keep]
            if not a.size:
                return pd.DataFrame(
                    {"id_a": np.empty(0, np.int64),
                     "id_b": np.empty(0, np.int64)}
                )
        cand = pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})
        return cand.drop_duplicates(["id_a", "id_b"])

    pairs_in_bucket.wants_arrow = True

    parts = exchange.scatter(
        kb.map_batches(lambda t: t.select(cols), batch_format="pyarrow"),
        n_buckets,
        bucket_of,
    )
    empty = pd.DataFrame(
        {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
    )
    return exchange.group_map(parts, pairs_in_bucket, empty)


def pair_payload_verify(
    cand: rd.Dataset,
    payload: rd.Dataset,
    id_col: str,
    verify_bucket_fn,
    n_buckets: int = 32,
    payload_cols: list[str] | None = None,
    empty_out: pd.DataFrame | None = None,
    max_pairs_per_bucket: int | None = 500_000,
) -> rd.Dataset:
    """Verify candidate pairs against a per-id payload WITHOUT broadcasting
    the payload: explode each pair into two member rows, cogroup with the
    payload by hash-partitioned id (task exchange — no padded union, each
    side keeps its dtypes), then re-scatter by pair and run
    ``verify_bucket_fn`` per pair-bucket. Duplicate pairs (e.g. from
    different LSH bands/tables) land in the same pair-bucket, so the
    verify fn dedups them there — no driver pass.

    ``payload_cols`` (the payload's non-id columns), when given, prunes
    the payload side to exactly the columns the verify needs before the
    exchange.

    ``max_pairs_per_bucket`` budgets DISTINCT pairs per verify bucket —
    the stage's real memory bound (each pair joins BOTH members'
    payloads, kB-scale vs the 16 B of an id pair) — raising a sized
    error instead of OOM-killing the verify task."""
    from . import exchange

    # Dedup candidates on a cheap pair-hash exchange BEFORE the payload
    # join: cross-band / cross-prefix-key duplicates of one pair (57x on
    # the r5 ngram smoke, up to n_tables/n_bands x for LSH) otherwise
    # ride the join each carrying both payloads, multiplying verify
    # memory by the duplication factor. Duplicates colocate here by
    # construction (same pair_bucket_keys formula as the final verify
    # scatter), so the post-dedup per-bucket count IS the verify task's
    # pair count — the right place for the budget check.
    def pair_bucket_of(t: pa.Table) -> np.ndarray:
        return pair_bucket_keys(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False),
            n_buckets,
        )

    pair_bucket_of.wants_arrow = True
    pair_bucket_of.needs_cols = ["id_a", "id_b"]

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["id_a", "id_b"]].drop_duplicates()
        if max_pairs_per_bucket is not None and len(g) > max_pairs_per_bucket:
            raise ValueError(
                f"verify-stage pair budget exceeded: {len(g):.3g} distinct "
                f"pairs in one pair-bucket (budget "
                f"{max_pairs_per_bucket:.3g}); each pair joins both "
                f"members' payloads. Raise n_buckets or the budget to "
                f"accept the memory cost explicitly, or use a stricter "
                f"candidate stage (higher threshold / more LSH planes)."
            )
        return g

    cand_empty = pd.DataFrame(
        {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
    )
    cand = exchange.group_map(
        exchange.scatter(cand, n_buckets, pair_bucket_of),
        dedup_bucket, cand_empty,
    )

    def explode(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        bb = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: np.concatenate([a, bb]),
                "id_a": np.concatenate([a, a]),
                "id_b": np.concatenate([bb, bb]),
            }
        )

    members = cand.map_batches(explode, batch_format="pyarrow")
    if payload_cols is not None:
        pcols = [id_col] + list(payload_cols)
        payload = payload.map_batches(
            lambda t: t.select(pcols), batch_format="pyarrow"
        )
    key = exchange.hash_bucket_fn(id_col, n_buckets)
    mparts, pparts = exchange.scatter_pair(members, key, payload, key, n_buckets)

    def join2(mtbl: pa.Table, ptbl: pa.Table) -> pa.Table:
        # inner join (Acero hash join — large binary payload columns stay
        # in Arrow buffers instead of round-tripping through pandas object
        # arrays): a pair member without payload (caller-supplied subset)
        # simply drops here; the pair itself dies in `run` below
        j = mtbl.join(ptbl.combine_chunks(), keys=id_col, join_type="inner")
        pb = pair_bucket_keys(
            j.column("id_a").to_numpy(zero_copy_only=False),
            j.column("id_b").to_numpy(zero_copy_only=False),
            n_buckets,
        )
        return j.append_column("__pb", pa.array(pb))

    join2.wants_arrow = True

    jempty = pd.DataFrame(
        {
            id_col: np.empty(0, np.int64),
            "id_a": np.empty(0, np.int64),
            "id_b": np.empty(0, np.int64),
            "__pb": np.empty(0, np.int64),
        }
    )
    joined = exchange.cogroup_map(mparts, pparts, join2, jempty, require="both")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__pb")
        # a pair is verifiable only if BOTH member payload rows joined
        present = set(g[id_col])
        ok = g["id_a"].isin(present).to_numpy() & g["id_b"].isin(present).to_numpy()
        return verify_bucket_fn(g[ok] if not ok.all() else g)

    # prune to __pb in the scatter task: without needs_cols the bucket fn
    # would force a whole-block pandas conversion of the binary payload
    jparts = exchange.scatter(
        joined, n_buckets, exchange.column_values_bucket_fn("__pb")
    )
    if empty_out is None:
        # schema probe: verify_bucket_fn MUST handle a column-less empty
        # frame (check len before touching columns) — pass empty_out to
        # opt out of the probe
        empty_out = verify_bucket_fn(pd.DataFrame())
    return exchange.group_map(jparts, run, empty_out)


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
    sketch_bits: int = 192,
) -> rd.Dataset:
    """Near-dup pairs via MinHash+LSH, verified with exact char-k-gram
    Jaccard — fully distributed, no driver-side merge and no full-corpus
    broadcast anywhere:

    1. vectorized signatures -> (band key, id) explode;
    2. candidate pairs per band bucket (``bucketed_pairs``: one hashed
       shuffle of two int64 columns, C-speed groupby per bucket — the
       >= 2-member prefilter is implicit);
    3. verify: pairs explode into member rows, payload (signature +
       shingle hashes) rejoined by hash-partitioned id (``bucket_join`` —
       both sides stream), regroup by pair; cross-band duplicates of a
       pair land in the same pair-bucket and are verified once. The verify
       is two-stage: a vectorized signature-agreement estimate first
       (cut at threshold - 4.5 * sqrt(t(1-t)/num_perm); a true pair at the
       threshold fails this with probability ~Phi(-4.5) ≈ 3e-6, and the
       observed margin on mixed-language corpora is far wider), then the
       exact char-k-gram Jaccard on the survivors only — LSH banding at
       (b=16, r=4) is deliberately recall-heavy and admits ~1000x more
       candidates than true pairs; without the estimate stage the exact
       intersections dominate the whole pipeline.

    ``texts`` supplies the (id, text) payload for the verify step and
    defaults to ``ds`` itself. Returns a Dataset (id_a, id_b, jaccard)
    with jaccard >= threshold, id_a < id_b.
    """
    if texts is None:
        # ds feeds BOTH the band explode and the verify payload — pin the
        # blocks once instead of executing the upstream plan twice (the
        # dual-consumer rule; a shuffle would have materialized it anyway)
        ds = ds.materialize()
        texts = ds
    buckets = minhash_lsh_buckets(
        ds, text_col, id_col, num_perm, bands, shingle_k,
        sketch_bits=sketch_bits,
    )
    sb_cols = [f"sb{w}" for w in range((sketch_bits + 63) // 64)]

    # Composite bucket key so the whole pipeline shuffles ONE int64 column
    # (plus the packed 1-bit sketch words for in-bucket pair pruning).
    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        bh = b["band_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        bid = b["band_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        b["bkey"] = (bh ^ (bid * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        return b[["bkey", id_col, *sb_cols]]

    kb = buckets.map_batches(keyed, batch_format="pandas")

    # 1-bit-sketch pair prune: matched bits / sketch_bits estimates
    # (1+s)/2, so cut at s >= threshold - 4.5 sigma with
    # sigma = 2 sqrt(p(1-p)/sketch_bits), p = (1+threshold)/2. A true
    # pair at the threshold fails with probability ~Phi(-4.5) ≈ 3e-6; at
    # the default 192 bits and threshold 0.5 a junk pair (s ≈ 0) survives
    # with probability ~7e-4 — the candidate stream shrinks ~1000x before
    # the member explode / payload join ever allocates for it.
    p_t = (1.0 + threshold) / 2.0
    s_cut = threshold - 9.0 * np.sqrt(p_t * (1.0 - p_t) / sketch_bits)
    match_cut = int(np.ceil((1.0 + s_cut) / 2.0 * sketch_bits))

    def bits_filter(cols_a: list, cols_b: list) -> np.ndarray:
        ham = popcount64(cols_a[0].view(np.uint64) ^ cols_b[0].view(np.uint64))
        for va, vb in zip(cols_a[1:], cols_b[1:]):
            ham += popcount64(va.view(np.uint64) ^ vb.view(np.uint64))
        return (sketch_bits - ham) >= match_cut

    cand = bucketed_pairs(
        kb, "bkey", id_col, n_buckets=n_buckets,
        payload_cols=sb_cols, pair_filter=bits_filter,
    )

    # Precompute each doc's sorted-unique shingle-hash array AND its
    # minhash signature ONCE (a doc participates in many pairs across many
    # verify buckets — shipping hashes instead of text avoids rebuilding
    # shingles per bucket; the signature feeds the cheap estimate stage).
    def to_payload(b: pd.DataFrame) -> pd.DataFrame:
        txts = b[text_col].tolist()
        hs, offs = char_shingle_hashes(txts, shingle_k)
        # estimate signatures permute the CHAR shingle hashes the exact
        # verify will intersect — one shingle pass for both stages, and
        # the agreement fraction estimates exactly the jaccard being
        # verified (byte-shingle minhash would re-shingle the batch)
        sig = minhash_from_hashes(hs, offs, num_perm, seed=7)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "sh_bytes": [
                    hs[offs[i] : offs[i + 1]].tobytes() for i in range(len(b))
                ],
                "sig_bytes": [sig[i].tobytes() for i in range(len(b))],
            }
        )

    payload = texts.map_batches(to_payload, batch_format="pandas")
    est_cut = max(
        0.0, threshold - 4.5 * np.sqrt(threshold * (1.0 - threshold) / num_perm)
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
             "jaccard": np.empty(0, float)}
        )
        if not len(g):
            return empty
        pairs = g[["id_a", "id_b"]].drop_duplicates()
        # stage 1: signature-agreement estimate, vectorized. One signature
        # matrix for the bucket's docs; per-permutation column compare
        # (2-D row gathers of the matrix are pathologically slow under
        # this kernel's THP behavior — the column loop is ~100x faster).
        uids, first = np.unique(g[id_col].to_numpy(), return_index=True)
        sig = np.vstack(
            [
                np.frombuffer(bb, dtype=np.uint64)
                for bb in g["sig_bytes"].to_numpy()[first]
            ]
        )
        pa_ = np.searchsorted(uids, pairs["id_a"].to_numpy())
        pb_ = np.searchsorted(uids, pairs["id_b"].to_numpy())
        match = np.zeros(len(pairs), dtype=np.int32)
        for j in range(num_perm):
            match += sig[pa_, j] == sig[pb_, j]
        pairs = pairs[match / num_perm >= est_cut]
        if not len(pairs):
            return empty
        # stage 2: exact char-k-gram Jaccard on the survivors
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

    return pair_payload_verify(
        cand, payload, id_col, verify_bucket, n_buckets,
        payload_cols=["sh_bytes", "sig_bytes"],
    )


# --- SimHash ----------------------------------------------------------------


def _token_hashes(tokens: list[str], seed: int) -> np.ndarray:
    """Deterministic 64-bit token hashes: FNV-1a over unicode CODEPOINTS
    (mod 2^64) then a splitmix64-style finisher mixed with the seed.
    Process-independent (Python's builtin hash() is per-process
    randomized and must never appear in distributed stages) and — unlike
    the polars hash_rows it replaced — exactly reproducible in ANSI SQL
    (HUGEINT multiply + mod 2^64), which gives simhash_fingerprints /
    simhash_dup_pairs bit-exact DuckDB oracles.

    Vectorized as one pass per codepoint POSITION (max token length
    passes over the flat codepoint array), not per token."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    blob = "".join(tokens)
    codes = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    FNV_OFF = np.uint64(0xCBF29CE484222325)
    FNV_PRIME = np.uint64(0x100000001B3)
    h = np.full(n, FNV_OFF, dtype=np.uint64)
    for p in range(int(lens.max(initial=0))):
        live = lens > p
        idx = starts[live] + p
        h[live] = (h[live] ^ codes[idx]) * FNV_PRIME
    # seed-mixed splitmix64 finisher (same constants as fixtures/rng.py)
    z = h + np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


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
        empty = pd.DataFrame(
            {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
             "hamming": np.empty(0, np.int64)}
        )
        a, b, order = keyed_id_pairs(g["ckey"].to_numpy(), g[id_col].to_numpy())
        if not a.size:
            return empty
        ids = g[id_col].to_numpy()[order]
        sh = g["simhash"].to_numpy()[order].view(np.uint64)
        ham = popcount64(sh[a] ^ sh[b])
        keep = ham <= max_hamming
        out = pd.DataFrame(
            {"id_a": ids[a[keep]], "id_b": ids[b[keep]], "hamming": ham[keep]}
        )
        return out.drop_duplicates(["id_a", "id_b"])

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
    # ds feeds BOTH the code explode and the verify payload — pin the
    # blocks once instead of executing the upstream plan twice
    ds = ds.materialize()
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

    return pair_payload_verify(
        cand, payload, id_col, verify_bucket, n_buckets, payload_cols=["emb_bytes"]
    )


def _dense_jaccard_pairs(
    ds: rd.Dataset,
    vocab: np.ndarray,
    threshold: float,
    text_col: str,
    id_col: str,
    shingle_k: int,
    n_buckets: int,
) -> rd.Dataset:
    """Dense-corpus exact Jaccard: docs as W-word bitmaps over the
    (small, broadcast) global shingle vocabulary; one id-hash scatter,
    then a triangular grid of partition-pair popcount tasks."""
    from . import exchange

    vocab_sorted = np.sort(vocab.view(np.uint64))
    n_words = max(1, (vocab_sorted.size + 63) // 64)
    vref = ray.put(vocab_sorted)

    def to_bitmap(b: pd.DataFrame) -> pd.DataFrame:
        voc = ray.get(vref)
        hs, offs = char_shingle_hashes(b[text_col].tolist(), shingle_k)
        sizes = np.diff(offs)
        idx = np.searchsorted(voc, hs)  # every hash is in the census
        rows = np.repeat(np.arange(len(b), dtype=np.int64), sizes)
        words = np.zeros((len(b), n_words), dtype=np.uint64)
        np.bitwise_or.at(
            words, (rows, idx >> 6), np.uint64(1) << (idx.astype(np.uint64) & np.uint64(63))
        )
        return pd.DataFrame(
            {
                "i": b[id_col].to_numpy(),
                "sz": sizes,
                "wb": [w.tobytes() for w in words],
            }
        )

    n_parts = min(n_buckets, 16)
    parts = exchange.scatter(
        ds.map_batches(to_bitmap, batch_format="pandas"),
        n_parts, exchange.hash_bucket_fn("i", n_parts),
    )
    refs = []
    for i in range(n_parts):
        if not parts[i]:
            continue
        for j in range(i, n_parts):
            if not parts[j]:
                continue
            if i == j:
                refs.append(
                    _bitmap_pair_task.remote(threshold, True, len(parts[i]), *parts[i])
                )
            else:
                refs.append(
                    _bitmap_pair_task.remote(
                        threshold, False, len(parts[i]), *parts[i], *parts[j]
                    )
                )
    empty = pd.DataFrame(
        {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
         "jaccard": np.empty(0, float)}
    )
    if not refs:
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    return rd.from_arrow_refs(refs)


@ray.remote
def _bitmap_pair_task(
    threshold: float, same: bool, n_left: int, *parts: pa.Table
) -> pa.Table:
    """All qualifying pairs between two doc-bitmap partitions: per-word
    popcount of the AND matrix (constant passes — no data-dependent
    loops), union from the precomputed set sizes. Exact on the shingle
    hash sets; O(na*nb*W) words of work, the inherent cost when the pair
    density itself is quadratic."""
    left = pa.concat_tables(parts[:n_left])
    right = left if same else pa.concat_tables(parts[n_left:])

    def unpack(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids = t.column("i").to_numpy(zero_copy_only=False)
        sz = t.column("sz").to_numpy(zero_copy_only=False)
        w = np.stack(
            [np.frombuffer(b, dtype=np.uint64) for b in t.column("wb").to_pylist()]
        )
        return ids, sz, w

    ida, sza, wa = unpack(left)
    idb, szb, wb = unpack(right) if not same else (ida, sza, wa)
    # Tile the left side so peak memory is bounded INDEPENDENT of partition
    # size: the full (na x nb) intersection matrix grows quadratically with
    # corpus size per task (ADVICE r3) — per tile it is <= 2048*nb int32
    # (int32 suffices: a doc's shingle count < 2^31). The per-word popcount
    # pass count is unchanged; only the allocation is chunked.
    out_a, out_b, out_j = [], [], []
    tile = 2048
    for s in range(0, ida.size, tile):
        e = min(s + tile, ida.size)
        inter = np.zeros((e - s, idb.size), dtype=np.int32)
        for w in range(wa.shape[1]):  # per-column 1-D gathers, W constant passes
            inter += popcount64(wa[s:e, w][:, None] & wb[None, :, w]).astype(np.int32)
        union = sza[s:e, None] + szb[None, :] - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= threshold
        if same:
            # each unordered pair once (ids are distinct within a partition)
            keep &= ida[s:e, None] < idb[None, :]
        ai, bi = np.nonzero(keep)
        out_a.append(np.minimum(ida[s + ai], idb[bi]))
        out_b.append(np.maximum(ida[s + ai], idb[bi]))
        out_j.append(jac[ai, bi])
    return pa.table(
        {
            "id_a": np.concatenate(out_a) if out_a else np.empty(0, np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.empty(0, np.int64),
            "jaccard": np.concatenate(out_j) if out_j else np.empty(0, float),
        }
    )


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 5,
    n_buckets: int = 32,
    dense_max: int = 1 << 16,
    dense_docs_max: int = 150_000,
    max_cand_pairs_per_bucket: int = 20_000_000,
    max_verify_pairs_per_bucket: int = 500_000,
) -> rd.Dataset:
    """EXACT char-k-gram Jaccard threshold self-join (id_a < id_b,
    jaccard >= threshold) — deterministic recall, two physical plans
    chosen by a MEASURED corpus statistic (the distinct-shingle count),
    because the optimal exact plan differs by an order of magnitude
    between sparse and dense similarity structures:

    - DENSE (distinct shingles <= ``dense_max``): low-diversity corpora
      (boilerplate, templated text, small-vocab synthetics) make EVERY
      prefix posting list span the corpus — no filter order can save a
      posting-explosion plan (measured: 8.9e7 candidate pair-rows for
      2.5e1 true pairs at sf0.1). Instead each doc becomes a W-word
      bitmap over the global shingle vocabulary (broadcast once,
      <= dense_max/8 bytes) and a triangular grid of partition-pair
      tasks computes exact popcount Jaccard — work is O(n^2 * W / P)
      with NO shuffle amplification, and the pair density of such
      corpora is itself quadratic, so the plan matches the output bound.
    - SPARSE: PPJoin-style prefix filtering [Xiao et al., WWW'08].

    Prefix principle: J(A,B) >= t implies |A∩B| >= t*|A∪B| >=
    ceil(t*|A|) for each side, so ANY (|A| - ceil(t*|A|) + 1)-element
    prefix of A in a fixed GLOBAL order must contain a shared element,
    and likewise for B. The order is everything for performance:
    hash order (round-3's first cut) puts the globally-smallest hashes
    in EVERY doc's prefix, so their posting lists span the corpus and
    pair generation goes quadratic (measured 359s at sf0.1). PPJoin's
    actual order is ascending DOCUMENT FREQUENCY — prefixes hold each
    doc's rarest shingles, posting lists stay near the true-pair volume.

    Plan (3 small-column exchanges, no broadcast, no driver merge):
    1. (hash, id, set_size) explode;
    2. exchange by hash — the reduce owns every copy of a hash, so df is
       a local count appended to each row (no separate df table or join);
    3. exchange by id — per doc, sort by (df, hash) and keep the
       (size - ceil(t*size) + 1)-prefix;
    4. ``bucketed_pairs`` over the prefix postings, then the exact
       sorted-array Jaccard verify over hash-partitioned payloads
       (``pair_payload_verify``).
    Pick this over LSH when the threshold is low (banding degrades) or
    exactness is required; LSH when t is high and the corpus is huge."""
    from . import exchange

    ds = ds.materialize()  # dual consumer: census/prefix explode + payload

    # --- plan selection: stream per-batch-unique shingle hashes to the
    # driver, stop as soon as the vocabulary exceeds dense_max (bounded
    # driver state ~dense_max*8 bytes regardless of corpus size)
    def batch_vocab(b: pd.DataFrame) -> pd.DataFrame:
        hs, _ = char_shingle_hashes(b[text_col].tolist(), shingle_k)
        return pd.DataFrame({"sh": np.unique(hs).view(np.int64)})

    vocab: np.ndarray | None = np.empty(0, dtype=np.int64)
    for vb in ds.map_batches(batch_vocab, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        vocab = np.union1d(vocab, vb["sh"].to_numpy())
        if vocab.size > dense_max:
            vocab = None  # diverse corpus -> PPJoin path
            break

    if vocab is not None:
        # The dense plan's compute is O(n_docs^2 * vocab/64) regardless of
        # how few pairs actually clear the threshold — optimal for small n
        # (no shuffle, SWAR popcount), a silent multi-hour cliff at large n
        # (surfaced by the r5 scale smoke: 500k docs x 52k-shingle vocab =
        # ~1.3e14 word-ANDs). A small-vocab corpus at large n has no good
        # EXACT plan: PPJoin's posting lists span the corpus here by
        # definition (measured 8.9e7 candidate rows for 25 true pairs on
        # the sf0.1 dense fixture), so refuse loudly instead of degrading.
        n_docs = ds.count()
        if n_docs > dense_docs_max:
            words = max(1, (min(vocab.size, dense_max) + 63) // 64)
            raise ValueError(
                f"ngram_jaccard_pairs: corpus has only {vocab.size} distinct "
                f"shingles but {n_docs} docs — exact threshold self-join on a "
                f"low-diversity corpus is inherently all-pairs "
                f"(~{n_docs * n_docs // 2 * words:.1e} popcount word-ops). "
                f"Raise dense_docs_max to accept that cost explicitly, shard "
                f"the corpus, or use minhash_lsh_pairs (probabilistic recall) "
                f"/ simhash near-dup instead."
            )
        return _dense_jaccard_pairs(
            ds, vocab, threshold, text_col, id_col, shingle_k, n_buckets
        )

    def shingle_rows(b: pd.DataFrame) -> pd.DataFrame:
        hs, offs = char_shingle_hashes(b[text_col].tolist(), shingle_k)
        sizes = np.diff(offs)
        return pd.DataFrame(
            {
                "sh": hs.view(np.int64),
                id_col: np.repeat(b[id_col].to_numpy(), sizes),
                "sz": np.repeat(sizes, sizes),
            }
        )

    def df_annotate(g: pa.Table) -> pd.DataFrame:
        sh = g.column("sh").to_numpy(zero_copy_only=False)
        _, inv, counts = np.unique(sh, return_inverse=True, return_counts=True)
        return pd.DataFrame(
            {
                "sh": sh,
                id_col: g.column(id_col).to_numpy(zero_copy_only=False),
                "sz": g.column("sz").to_numpy(zero_copy_only=False),
                "df": counts[inv].astype(np.int64),
            }
        )

    df_annotate.wants_arrow = True
    ann_empty = pd.DataFrame(
        {c: np.empty(0, np.int64) for c in ["sh", id_col, "sz", "df"]}
    )
    ann = exchange.group_map(
        exchange.scatter(
            ds.map_batches(shingle_rows, batch_format="pandas"),
            n_buckets, exchange.hash_bucket_fn("sh", n_buckets),
        ),
        df_annotate, ann_empty,
    )

    def select_prefix(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        sh = g["sh"].to_numpy()
        dfv = g["df"].to_numpy()
        sz = g["sz"].to_numpy()
        order = np.lexsort((sh, dfv, ids))  # per doc: (df, hash) ascending
        ids, sh, sz = ids[order], sh[order], sz[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        counts = np.diff(np.r_[starts, ids.size])
        rank = np.arange(ids.size) - np.repeat(starts, counts)
        plen = sz - np.ceil(threshold * sz).astype(np.int64) + 1
        keep = rank < plen
        return pd.DataFrame({"pkey": sh[keep], id_col: ids[keep]})

    pref_empty = pd.DataFrame(
        {"pkey": np.empty(0, np.int64), id_col: np.empty(0, np.int64)}
    )
    pref = exchange.group_map(
        exchange.scatter(
            ann, n_buckets, exchange.hash_bucket_fn(id_col, n_buckets)
        ),
        select_prefix, pref_empty,
    )

    # Two budgets, sized for what each stage actually allocates. The
    # GENERATION budget here bounds the raw pair explode (16 B/pair:
    # 2e7 -> ~1 GB transient per reduce task) and turns a corpus whose
    # prefix postings are uniformly hot (no rare shingles -> candidate
    # volume ~ sum df^2, intrinsically quadratic) into a sized error
    # instead of a worker OOM. A benign web-shape corpus emits each true
    # pair once per SHARED PREFIX SHINGLE (~50x duplication at t=0.8 —
    # the r5 smoke tripped a flat 5e5 budget on 1.4e6 legitimate rows),
    # so this bound must sit well above the VERIFY budget, which applies
    # to DISTINCT pairs after pair_payload_verify's pre-join dedup
    # (~4.4 KB/pair with both shingle payloads: 5e5 -> ~2 GB/task).
    cand = bucketed_pairs(
        pref, "pkey", id_col, n_buckets=n_buckets,
        max_pairs_per_bucket=max_cand_pairs_per_bucket,
    )

    def to_payload(b: pd.DataFrame) -> pd.DataFrame:
        hs, offs = char_shingle_hashes(b[text_col].tolist(), shingle_k)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "sh_bytes": [
                    hs[offs[i] : offs[i + 1]].tobytes() for i in range(len(b))
                ],
            }
        )

    payload = ds.map_batches(to_payload, batch_format="pandas")

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
             "jaccard": np.empty(0, float)}
        )
        if not len(g):
            return empty
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

    return pair_payload_verify(
        cand, payload, id_col, verify_bucket, n_buckets,
        payload_cols=["sh_bytes"],
        max_pairs_per_bucket=max_verify_pairs_per_bucket,
    )


def blocked_pair_edges(
    ds: rd.Dataset,
    key_cols: list[str],
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.2,
    n_buckets: int = 32,
    max_pairs_per_bucket: int | None = 20_000_000,
    reduce_num_cpus: float | None = None,
) -> rd.Dataset:
    """Near-dup edges from EQUALITY blocking (one block key per doc, e.g.
    (n_chars, lang)) in ONE shuffle: rows (id, keys, text) hash-bucket by
    block key; inside each bucket a groupby over the exact key tuple
    generates all pairs and verifies char-k-gram Jaccard in place —
    shingle sets built once per doc per bucket, no payload rejoin needed
    (contrast minhash_dedup_pairs, where a doc appears in many bands and
    the rejoin earns its shuffle). Salt skew-prone block keys upstream
    (stages/partition.py). Returns (id_a, id_b, jaccard), id_a < id_b.
    Requires threshold > 0 (the posting-list kernel only sees pairs with
    at least one shared shingle).

    ``max_pairs_per_bucket`` bounds the DISTINCT candidate pairs resident
    per bucket: equality blocking is all-pairs WITHIN a block, so a key
    that fails to discriminate (e.g. (n_chars, lang) over a fixed-length
    corpus — 4 blocks of 125k docs on the r5 smoke) is intrinsically
    quadratic; refuse sized instead of OOM-killing the reduce task. The
    posting-pair TRANSIENT (pairs with multiplicity across shingles —
    measured 3.5e7→1.4e8/bucket for 1M→2M docs on a web-shape corpus) is
    chunked by ``posting_pair_counts`` and never held whole, so a
    growing corpus only hits the budget when the distinct candidate set
    itself outgrows memory."""
    from . import exchange

    if threshold <= 0:
        raise ValueError("blocked_pair_edges requires threshold > 0")

    bucket_of = exchange.key_cols_bucket_fn(key_cols, n_buckets)

    empty = pd.DataFrame(
        {
            "id_a": np.empty(0, np.int64),
            "id_b": np.empty(0, np.int64),
            "jaccard": np.empty(0, float),
        }
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Inverted-index Jaccard inside the bucket, no per-pair Python:
        each (block, shingle-hash) posting list emits its within-block doc
        pairs (``run_pairs``); intersection sizes fall out of one
        ``np.unique`` over packed pair keys; a pair with NO shared shingle
        never reaches a positive threshold, so posting lists cover exactly
        the candidate set (requires threshold > 0)."""
        if len(g) < 2:
            return empty
        gid = g.groupby(key_cols, sort=False).ngroup().to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, gid))
        gid, ids = gid[order], ids[order]
        texts = g[text_col].to_numpy()[order].tolist()
        hs, offs = char_shingle_hashes(texts, shingle_k)
        sizes = np.diff(offs)
        doc_of = np.repeat(np.arange(len(ids)), sizes)
        ge = gid[doc_of]
        e_order = np.lexsort((doc_of, hs, ge))
        he, ge, de = hs[e_order], ge[e_order], doc_of[e_order]
        new_run = np.concatenate(
            [[True], (he[1:] != he[:-1]) | (ge[1:] != ge[:-1])]
        ) if he.size else np.empty(0, bool)
        starts = np.flatnonzero(new_run)
        # doc positions ascend within a run (lexsort minor key), and ids
        # ascend with position within a block -> id_a < id_b
        n = len(ids)
        uk, cnt = posting_pair_counts(
            starts, he.size, de, n, max_pairs_per_bucket,
            "The equality block key does not discriminate on this corpus "
            "(all-pairs within a block is inherent to blocking). Use a "
            "finer block key, raise the budget to accept the memory cost "
            "explicitly, or switch to a prefix-filtered / LSH candidate "
            "stage (ngram_jaccard_pairs, minhash_lsh_pairs).",
        )
        if not uk.size:
            return empty
        pa_, pb_ = uk // n, uk % n
        union = sizes[pa_] + sizes[pb_] - cnt
        jac = cnt / union
        keep = jac >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[pa_[keep]].astype(np.int64),
                "id_b": ids[pb_[keep]].astype(np.int64),
                "jaccard": jac[keep].astype(float),
            }
        )

    parts = exchange.scatter(
        ds.map_batches(
            lambda b: b[[id_col, text_col, *key_cols]], batch_format="pandas"
        ),
        n_buckets,
        bucket_of,
    )
    return exchange.group_map(
        parts, per_bucket, empty,
        reduce_num_cpus=pair_reduce_cpus(max_pairs_per_bucket, reduce_num_cpus),
    )


def exact_substring_dedup(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    n_buckets: int = 32,
) -> rd.Dataset:
    """EXACT duplicated-substring removal (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" operator
    shape): every character covered by a k-char substring that occurs
    >= 2 times in the CORPUS (any doc, including overlaps within one doc)
    is removed from every doc; the survivors are reassembled in order.
    Policy note: all occurrences are removed (deterministic — no
    keep-one-copy tie decision), which is the decontamination-grade
    variant.

    Plan (two exchanges, both on the task exchange):
    1. explode (gram, doc, pos) — gram strings carried so duplicate
       detection is EXACT (no hash-collision caveat), bucketed by gram
       hash: each reduce owns every copy of a gram and emits the
       positions of grams with corpus count >= 2.
    2. duplicate positions cogroup with (doc, text) by doc bucket; the
       interval union per doc is vectorized with the offset-cummax trick
       (no per-doc Python until the final slicing of docs that actually
       contain duplicates).

    At 100 TB the explode is ~k bytes/char; production would prefilter by
    a first hash-only pass (carrying strings only for candidate hashes,
    the incremental_dedup pattern) — documented here, exactness kept for
    the gate."""
    from . import exchange

    ds = ds.materialize()  # dual consumer: gram explode + payload cogroup

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # id dtype preserved (int64 corpus ids OR 'doc-…' string ids —
        # np.full would truncate strings to a fixed-width U dtype)
        int_ids = pd.api.types.is_integer_dtype(b[id_col])
        id_dtype = np.int64 if int_ids else object
        ids, grams, pos = [], [], []
        for did, t in zip(b[id_col].to_numpy(), b[text_col].to_numpy()):
            n = len(t)
            if n < k:
                continue
            m = n - k + 1
            ids.append(np.full(m, did, dtype=id_dtype))
            grams.extend(t[p : p + k] for p in range(m))
            pos.append(np.arange(1, m + 1, dtype=np.int64))
        if not ids:
            return pd.DataFrame(
                {"g": pd.Series([], dtype=str),
                 id_col: pd.Series([], dtype=np.int64),
                 "p": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"g": grams, id_col: np.concatenate(ids), "p": np.concatenate(pos)}
        )

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("g")["g"].transform("size")
        out = g[cnt >= 2]
        return out[[id_col, "p"]]

    gram_rows = ds.map_batches(explode, batch_format="pandas")
    dup_empty = pd.DataFrame(
        {id_col: pd.Series([], dtype=np.int64), "p": pd.Series([], dtype=np.int64)}
    )
    dups = exchange.group_map(
        exchange.scatter(
            gram_rows, n_buckets, exchange.key_cols_bucket_fn(["g"], n_buckets)
        ),
        dup_positions, dup_empty,
    )

    def assemble(dup_df: pd.DataFrame | None, docs_df: pd.DataFrame | None) -> pd.DataFrame:
        if docs_df is None or not len(docs_df):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "n_dup_spans": pd.Series([], dtype=np.int64),
                 "n_removed": pd.Series([], dtype=np.int64),
                 "clean_text": pd.Series([], dtype=str)}
            )
        spans_of: dict[int, list[tuple[int, int]]] = {}
        if dup_df is not None and len(dup_df):
            d = dup_df[id_col].to_numpy()
            p = dup_df["p"].to_numpy()
            order = np.lexsort((p, d))
            d, p = d[order], p[order]
            # composite island keys use COMPACT doc ranks, not raw ids: a
            # raw doc_id * BIG product wraps int64 for ids >= 2^23 (the
            # CLAUDE.md silent-wrap class) — ranks are bounded by the
            # bucket's row count, and the bound is asserted anyway
            _, rank = np.unique(d, return_inverse=True)  # works for str ids too
            BIG = np.int64(p.max()) + k + 1
            if int(rank[-1] if rank.size else 0) * int(BIG) >= 1 << 62:
                raise ValueError("substring-dedup bucket too large for island keys")
            pk = rank * BIG + p
            ek = pk + k
            prev_max = np.concatenate(([np.iinfo(np.int64).min],
                                       np.maximum.accumulate(ek)[:-1]))
            new_isl = pk > prev_max
            starts = np.flatnonzero(new_isl)
            s = p[starts]
            e = np.maximum.reduceat(p + k, starts)
            sd = d[starts]
            for j in range(sd.size):
                spans_of.setdefault(sd[j], []).append((int(s[j]), int(e[j])))
        out_rows = []
        for did, t in zip(docs_df[id_col].to_numpy(), docs_df[text_col].to_numpy()):
            spans = spans_of.get(did)
            if not spans:
                out_rows.append((did, 0, 0, t))
                continue
            kept = []
            cur = 1  # 1-based positions like SQL substr
            removed = 0
            for s0, e0 in spans:
                kept.append(t[cur - 1 : s0 - 1])
                removed += e0 - s0
                cur = e0
            kept.append(t[cur - 1 :])
            out_rows.append((did, len(spans), removed, "".join(kept)))
        return pd.DataFrame(
            out_rows, columns=[id_col, "n_dup_spans", "n_removed", "clean_text"]
        )

    docs_only = ds.select_columns([id_col, text_col])
    # key_cols bucketer (pandas hash) so STRING doc ids co-route too
    parts_dup, parts_docs = exchange.scatter_pair(
        dups, exchange.key_cols_bucket_fn([id_col], n_buckets),
        docs_only, exchange.key_cols_bucket_fn([id_col], n_buckets),
        n_buckets,
    )
    empty = pd.DataFrame(
        {id_col: pd.Series([], dtype=np.int64),
         "n_dup_spans": pd.Series([], dtype=np.int64),
         "n_removed": pd.Series([], dtype=np.int64),
         "clean_text": pd.Series([], dtype=str)}
    )
    return exchange.cogroup_map(parts_dup, parts_docs, assemble, empty, require="right")

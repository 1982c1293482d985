"""Mergeable sketches: HyperLogLog distinct counting + Bloom membership.

The reference has no sketches (SURVEY.md §2.5); these are the
training-data-scale extensions for cardinality and membership where exact
state would not fit. Both follow the guide's merge pattern: one small
sketch per batch emitted from ``map_batches``, merged in a tiny final
step — no shuffle of raw values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..fixtures.rng import splitmix64


def _hash64(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind in ("i", "u"):
        return splitmix64(values.astype(np.uint64))
    # strings: stable FNV-ish via pandas hash (stable within a run; for
    # cross-run stability hash the utf-8 bytes)
    return pd.util.hash_array(np.asarray(values)).astype(np.uint64)


class HLL:
    """HyperLogLog with 2^p registers (standard bias-corrected estimate)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add(self, values: np.ndarray) -> "HLL":
        h = _hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction
        f = rest.astype(np.float64)
        exp = ((f.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF)).astype(np.int64)
        lz = 1086 - exp  # 1023 + 63 = exponent of 2^63 (top bit set)
        rank = np.clip(lz + 1, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        e = alpha * m * m / inv
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting for small range
        return float(e)


def hll_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate count-distinct of a column: one HLL per batch, merged
    driver-side (each sketch is 4 KiB — merge is trivial)."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        h = HLL(p).add(b[col].to_numpy())
        return pd.DataFrame({"registers": [h.registers.tobytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    acc = HLL(p)
    for blob in parts.registers:
        acc = acc.merge(HLL(p, np.frombuffer(blob, dtype=np.uint8).copy()))
    return acc.estimate()


class BloomFilter:
    """Simple k-hash Bloom filter over int64/str keys — the broadcast
    membership structure for semi-joins whose key set no longer fits as a
    sorted array (guide: 'broadcast the key set or a Bloom filter of it')."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h = _hash64(values)
        out = np.empty((self.k, h.size), dtype=np.int64)
        for i in range(self.k):
            h = splitmix64(h + np.uint64(i * 0x9E3779B9))
            out[i] = (h % np.uint64(self.n_bits)).astype(np.int64)
        return out

    def add(self, values: np.ndarray) -> "BloomFilter":
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return self

    def contains(self, values: np.ndarray) -> np.ndarray:
        pos = self._positions(values)
        hit = np.ones(values.shape[0], dtype=bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.bits[p // 8] & (1 << (p % 8)).astype(np.uint8)) != 0
        return hit


class TDigest:
    """Mergeable quantile sketch (t-digest, Dunning & Ertl): weighted
    centroids compressed under the k1-style size bound
    w_cluster <= 4 * total * q * (1 - q) / delta — tails stay precise,
    the middle compresses. The scale path for grouped quantiles whose
    groups no longer fit in one map_groups (VERDICT: percentile_profile
    holds whole groups; this sketch replaces that at high cardinality)."""

    def __init__(self, delta: int = 200, means=None, weights=None):
        self.delta = delta
        self.means = np.asarray(means, dtype=np.float64) if means is not None else np.empty(0)
        self.weights = (
            np.asarray(weights, dtype=np.float64) if weights is not None else np.empty(0)
        )

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> "TDigest":
        if means.size == 0:
            return self
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        acc_m, acc_w, cum = means[0] * weights[0], weights[0], 0.0
        for m, w in zip(means[1:], weights[1:]):
            q = (cum + acc_w / 2) / total
            cap = max(1.0, 4.0 * total * q * (1 - q) / self.delta)
            if acc_w + w <= cap:
                acc_m += m * w
                acc_w += w
            else:
                out_m.append(acc_m / acc_w)
                out_w.append(acc_w)
                cum += acc_w
                acc_m, acc_w = m * w, w
        out_m.append(acc_m / acc_w)
        out_w.append(acc_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
        return self

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        return self._compress(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, np.ones(v.size)]),
        )

    def merge(self, other: "TDigest") -> "TDigest":
        return self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * total
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, delta: int = 200) -> "TDigest":
        arr = np.frombuffer(blob, dtype=np.float64)
        half = arr.size // 2
        return cls(delta, arr[:half].copy(), arr[half:].copy())


def tdigest_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], delta: int = 200
) -> dict[float, float]:
    """Approximate quantiles of a column: one t-digest per batch (a few
    hundred centroids each), merged driver-side — no shuffle, no
    per-group materialization."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(delta).add(b[col].to_numpy())
        return pd.DataFrame({"digest": [d.to_bytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    acc = TDigest(delta)
    for blob in parts.digest:
        acc = acc.merge(TDigest.from_bytes(blob, delta))
    return {q: acc.quantile(q) for q in qs}


def _k1_bins(q_mid: np.ndarray, delta: int) -> np.ndarray:
    """t-digest k1 scale-function binning: bin = floor(delta * k1(q)),
    k1(q) = asin(2q-1)/pi + 0.5 — small bins at the tails (where the
    slope of k1 is large), wide in the middle. Every op (asin, /, floor)
    evaluates bit-identically in numpy and DuckDB, which is the point."""
    return np.floor(delta * (np.arcsin(2.0 * q_mid - 1.0) / np.pi + 0.5)).astype(np.int64)


def _binned_centroids(v: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-shot binned compress of a value multiset: sort, assign each
    rank's mid-quantile to a k1 bin, emit per-bin (bin, mean, weight).
    A pure function of the multiset (equal values are interchangeable
    across a bin boundary), hence partition- and order-independent —
    unlike the greedy k1 compress (TDigest above), which folds
    sequentially and depends on insertion batching."""
    v = np.sort(np.asarray(v, dtype=np.float64))
    n = v.size
    bins = _k1_bins((np.arange(n) + 0.5) / n, delta)
    offsets = np.concatenate([[0], np.flatnonzero(np.diff(bins)) + 1])
    w = np.diff(np.concatenate([offsets, [n]])).astype(np.float64)
    # np.add.reduceat is a sequential in-order fold — matches DuckDB's
    # list_sum(list(value ORDER BY value)) accumulation exactly
    return bins[offsets], np.add.reduceat(v, offsets) / w, w


def merge_binned_centroids(
    cent: pd.DataFrame, qs: list[float], delta: int
) -> dict[float, float]:
    """One-shot merge of per-bucket binned digests + quantile read-out.
    ``cent`` columns: bkt, bin, m, w (<= n_buckets * delta rows — driver
    sized by construction). Deterministic total order (m, bkt, bin);
    integer-valued weights keep every cumulative sum exact."""
    cent = cent.sort_values(["m", "bkt", "bin"], kind="stable")
    m = cent.m.to_numpy()
    w = cent.w.to_numpy()
    total = w.sum()
    cum = np.cumsum(w)
    bin2 = _k1_bins((cum - w / 2.0) / total, delta)
    offsets = np.concatenate([[0], np.flatnonzero(np.diff(bin2)) + 1])
    W = np.add.reduceat(w, offsets)
    M = np.add.reduceat(m * w, offsets) / W
    cmid = np.cumsum(W) - W / 2.0
    out = {}
    for q in qs:
        t = q * total
        j = int(np.searchsorted(cmid, t, side="right")) - 1
        if j < 0:
            e = M[0]
        elif j >= M.size - 1:
            e = M[-1]
        else:
            e = M[j] + (M[j + 1] - M[j]) / (cmid[j + 1] - cmid[j]) * (t - cmid[j])
        out[q] = float(e)
    return out


def binned_tdigest_quantiles(
    ds: rd.Dataset,
    col: str,
    key_col: str,
    qs: list[float],
    *,
    delta: int = 100,
    n_buckets: int = 8,
) -> dict[float, float]:
    """DETERMINISTIC distributed t-digest quantiles — the replayable
    variant (VERDICT r3 #1): rows route to ``key_col % n_buckets``
    partitions through the task exchange, each bucket compresses its
    value multiset with the k1 binning (partition-independent), and the
    driver merges <= n_buckets * delta centroids in one fixed-order
    pass. Every arithmetic step is replayable bit-exactly in SQL
    (pipelines/oracle_sql.py: tdigest_replay_sql), so the estimate
    itself is oracle-checkable — not just its error bound.

    Tradeoff vs ``tdigest_quantiles`` (classic greedy digest): this path
    pays one value-column exchange (8 bytes/row) so each bucket sees its
    whole multiset; n_buckets is the scale knob (reducer count). The
    classic path stays shuffle-free but its centroids depend on block
    boundaries, which no oracle can replay."""
    from .exchange import column_values_bucket_fn, group_map, scatter

    def add_bkt(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({col: tbl.column(col), "bkt": k % n_buckets})

    def per_bucket(tbl: pa.Table) -> pd.DataFrame:
        bins, means, weights = _binned_centroids(
            tbl.column(col).to_numpy(zero_copy_only=False), delta
        )
        bkt = int(tbl.column("bkt")[0].as_py())
        return pd.DataFrame({"bkt": bkt, "bin": bins, "m": means, "w": weights})

    per_bucket.wants_arrow = True

    parts = scatter(
        ds.map_batches(add_bkt, batch_format="pyarrow"),
        n_buckets,
        column_values_bucket_fn("bkt"),
    )
    empty = pd.DataFrame(
        {"bkt": pd.Series([], dtype=np.int64), "bin": pd.Series([], dtype=np.int64),
         "m": pd.Series([], dtype=np.float64), "w": pd.Series([], dtype=np.float64)}
    )
    cent = group_map(parts, per_bucket, empty).to_pandas()
    return merge_binned_centroids(cent, qs, delta)


def grouped_binned_tdigest_quantiles(
    ds: rd.Dataset,
    key: str,
    col: str,
    key_col: str,
    qs: list[float],
    *,
    delta: int = 100,
    n_buckets: int = 8,
    group_buckets: int = 8,
) -> rd.Dataset:
    """DETERMINISTIC grouped t-digest quantiles — the replayable grouped
    variant (same construction as :func:`binned_tdigest_quantiles`, keyed):
    rows route to (key, key_col % n_buckets) cells through the task
    exchange, each cell compresses its value multiset with the k1 binning
    (partition-independent), and a second tiny grouped pass merges each
    key's <= n_buckets * delta centroids in the fixed (m, bkt, bin)
    order. Replayed bit-exactly by oracle_sql.tdigest_replay_sql(grp_col=
    key). Returns one row per key with p<q> columns."""
    from .aggregates import bucketed_group_agg
    from .exchange import group_map, key_cols_bucket_fn, scatter

    def add_bkt(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {key: tbl.column(key), col: tbl.column(col), "bkt": k % n_buckets}
        )

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for (k_, bkt), g in df.groupby([key, "bkt"]):
            bins, means, weights = _binned_centroids(g[col].to_numpy(), delta)
            frames.append(
                pd.DataFrame({key: k_, "bkt": int(bkt), "bin": bins,
                              "m": means, "w": weights})
            )
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {key: [], "bkt": [], "bin": [], "m": [], "w": []}
        )

    parts = scatter(
        ds.map_batches(add_bkt, batch_format="pyarrow"),
        group_buckets * n_buckets,
        key_cols_bucket_fn([key, "bkt"], group_buckets * n_buckets),
    )
    empty = pd.DataFrame(
        {key: pd.Series([], dtype=object), "bkt": pd.Series([], dtype=np.int64),
         "bin": pd.Series([], dtype=np.int64), "m": pd.Series([], dtype=np.float64),
         "w": pd.Series([], dtype=np.float64)}
    )
    cent = group_map(parts, per_cell, empty)

    def merge_key(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k_, g in df.groupby(key):
            est = merge_binned_centroids(g, qs, delta)
            row = {key: k_}
            for q in qs:
                row[f"p{round(q * 100):02d}"] = est[q]
            rows.append(row)
        cols = [key] + [f"p{round(q * 100):02d}" for q in qs]
        return pd.DataFrame(rows, columns=cols)

    return bucketed_group_agg(cent, [key], merge_key, n_buckets=group_buckets)


class CountMinSketch:
    """Count-min frequency sketch (Cormode & Muthukrishnan '05): ``depth``
    rows x ``width`` counters; an item's estimate is the min over its
    ``depth`` hashed counters — always >= the true count, over by at most
    eps*N (eps ~ e/width) with probability 1-delta (delta ~ e^-depth).
    Mergeable by element-wise addition, so the scale pattern mirrors HLL:
    one sketch per batch from map_batches, small driver-side merge — token
    frequency estimates at corpus scale without shuffling the vocabulary."""

    def __init__(self, depth: int = 4, width: int = 1 << 14, table: np.ndarray | None = None):
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64) if table is None else table

    def _cols(self, values: np.ndarray) -> np.ndarray:
        h = _hash64(values)
        # row salts via array multiply (silent uint64 wraparound)
        salts = np.arange(self.depth, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        cols = np.empty((self.depth, h.size), dtype=np.int64)
        for r in range(self.depth):
            hr = splitmix64(h + salts[r])
            cols[r] = (hr % np.uint64(self.width)).astype(np.int64)
        return cols

    def add(self, values: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        if values.size == 0:
            return self
        c = np.ones(values.size, dtype=np.int64) if counts is None else counts.astype(np.int64)
        cols = self._cols(values)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], c)
        return self

    def estimate(self, values: np.ndarray) -> np.ndarray:
        if values.size == 0:
            return np.empty(0, dtype=np.int64)
        cols = self._cols(values)
        ests = np.stack([self.table[r][cols[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.table.shape == other.table.shape
        return CountMinSketch(self.depth, self.width, self.table + other.table)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, depth: int = 4, width: int = 1 << 14) -> "CountMinSketch":
        return cls(depth, width, np.frombuffer(blob, dtype=np.int64).reshape(depth, width).copy())


def cms_counts(
    ds: rd.Dataset, col: str, probe: np.ndarray, *, depth: int = 4, width: int = 1 << 14
) -> np.ndarray:
    """Estimated frequencies of ``probe`` values: one CMS per batch,
    merged driver-side (constant size per block)."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        s = CountMinSketch(depth, width).add(b[col].to_numpy())
        return pd.DataFrame({"cms": [s.to_bytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    acc = CountMinSketch(depth, width)
    for blob in parts.cms:
        acc = acc.merge(CountMinSketch.from_bytes(blob, depth, width))
    return acc.estimate(probe)


def grouped_tdigest_quantiles(
    ds: rd.Dataset,
    key: str,
    col: str,
    qs: list[float],
    *,
    delta: int = 200,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Grouped approximate quantiles — the scale path for A2 percentile
    profiles when the key is high-cardinality (exact per-group quantiles
    must hold whole groups; digests are a few hundred centroids per key
    regardless of group size). One digest per (key, batch) from
    map_batches, merged per key inside a bucketed grouped pass."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        ks, blobs = [], []
        for k_, g in b.groupby(key):
            ks.append(k_)
            blobs.append(TDigest(delta).add(g[col].to_numpy()).to_bytes())
        return pd.DataFrame({key: ks, "digest": blobs})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k_, g in df.groupby(key):
            acc = TDigest(delta)
            for blob in g.digest:
                acc = acc.merge(TDigest.from_bytes(blob, delta))
            row = {key: k_}
            for q in qs:
                row[f"p{round(q * 100):02d}"] = acc.quantile(q)
            rows.append(row)
        cols = [key] + [f"p{round(q * 100):02d}" for q in qs]
        return pd.DataFrame(rows, columns=cols)

    from .aggregates import bucketed_group_agg

    return bucketed_group_agg(
        ds.map_batches(sketch, batch_format="pandas"), [key], agg, n_buckets=n_buckets
    )


def hll_grouped_distinct(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    p: int = 12,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Per-key approximate count-distinct — the scale path when BOTH the
    key cardinality and the per-key value cardinality are unbounded
    (exact per-key distinct needs a value shuffle; this ships one
    2^p-byte register array per (key, block) instead). Per batch: one HLL
    per key present; partial sketches bucket by hash(key) and merge
    register-wise per key in one grouped pass. Returns (key, estimate)."""
    from . import exchange

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in b.groupby(key_col, sort=False):
            rows.append((k, HLL(p).add(g[val_col].to_numpy()).registers.tobytes()))
        return pd.DataFrame(rows, columns=[key_col, "registers"])

    parts_ds = ds.map_batches(sketch, batch_format="pandas")

    def bucket_of(b: pd.DataFrame) -> np.ndarray:
        return (
            pd.util.hash_array(b[key_col].to_numpy()).astype(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int64)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in g.groupby(key_col, sort=False):
            regs = np.frombuffer(grp.registers.iloc[0], dtype=np.uint8).copy()
            for blob in grp.registers.iloc[1:]:
                np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
            rows.append((k, HLL(p, regs).estimate()))
        return pd.DataFrame(rows, columns=[key_col, "estimate"])

    empty = pd.DataFrame({key_col: pd.Series([], dtype=object),
                          "estimate": pd.Series([], dtype=float)})
    return exchange.group_map(
        exchange.scatter(parts_ds, n_buckets, bucket_of), merge_bucket, empty
    )

"""Per-partition lineage manifest + resumable output layout.

North-rule requirement: a killed run must resume without recomputing
completed partitions. The reference's version of this is file-existence
idempotency (skip outputs already on disk: geoEpic/sites/generate.py:97-98,
geoEpic/soil/ssurgo_gdb.py:129-130, geoEpic/gee/fetch.py:67-68). The
engine's version is structured:

    out_dir/
      part=<key>/ ...parquet files...      # one directory per partition
      _manifest/part-<key>.json            # written AFTER the partition data

A partition's manifest row records (partition key, input fingerprint, row
count, span hash). On restart, partitions whose manifest row exists AND
matches the input fingerprint are skipped (anti-join of pending keys
against the manifest). Data is written to a temp dir then renamed so a
partition is either absent or complete.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class PartitionRecord:
    key: str
    input_fingerprint: str
    row_count: int
    span_hash: str
    elapsed_s: float = 0.0  # write duration — the per-partition metric
    bytes_written: int = 0


def span_hash_of(table: pa.Table, span_col: str = "spans", id_col: str = "doc_id") -> str:
    """Row-order-insensitive, span-order-SENSITIVE hash of the per-row
    span sequences — the per-row invariant from BASELINE.json input_hint.

    Vectorized: spans are flattened once, each span struct row is hashed
    natively (polars hash_rows), folded in span order per doc with a
    polynomial (so reordering spans within a doc changes the value),
    combined with the doc id hash, then XOR-reduced across rows (so row
    order / partitioning does not). ~1000x the speed of per-row
    json+sha256, which dominated the 16M-doc write at ~50us/row.
    """
    if span_col not in table.column_names:
        return "no-spans"
    import polars as pl

    spans = table[span_col]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()  # struct array of all spans, doc-major order
    n = table.num_rows
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    doc_fold = np.zeros(n, dtype=np.uint64)
    if len(flat):
        span_h = (
            pl.from_arrow(pa.table({"s": flat})).hash_rows(seed=7).to_numpy()
        ).astype(np.uint64)
        # order-sensitive fold per doc: sum of h_i * B^pos_i (uint64 wrap)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], counts)
        powers = np.ones(len(flat), dtype=np.uint64)
        base = 1099511628211
        rem = pos.astype(np.uint64)
        for _ in range(int(pos.max()).bit_length()):
            odd = (rem & np.uint64(1)) == 1
            powers[odd] *= np.uint64(base)
            rem >>= np.uint64(1)
            base = (base * base) & ((1 << 64) - 1)
        folded = span_h * powers
        # reduce only at non-empty docs' starts: those are strictly
        # increasing and < len(flat), so no segment is truncated even when
        # trailing docs have empty span lists (empty docs between two
        # non-empty starts contribute no rows to the left segment)
        nonempty = counts > 0
        starts = offsets[:-1][nonempty]
        if starts.size:
            doc_fold[nonempty] = np.add.reduceat(folded, starts)
    ids = (
        pl.from_arrow(pa.table({"i": table[id_col]})).hash_rows(seed=11).to_numpy()
    ).astype(np.uint64)
    per_row = (doc_fold ^ (ids * np.uint64(0x9E3779B97F4A7C15))) | np.uint64(1)
    acc = np.bitwise_xor.reduce(per_row) if n else np.uint64(0)
    return f"{int(acc):016x}"


def _fnv1a_codepoints(strs: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over unicode codepoints per string (the same
    kernel as stages/dedup._token_hashes, duplicated here to keep state/
    free of stages/ imports)."""
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lst = [str(s) for s in strs]
    blob = "".join(lst)
    codes = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    lens = np.fromiter((len(t) for t in lst), dtype=np.int64, count=n)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    h = np.full(n, np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    for p in range(int(lens.max(initial=0))):
        live = lens > p
        h[live] = (h[live] ^ codes[starts[live] + p]) * prime
    return h


def _splitmix_finish(z: np.ndarray) -> np.ndarray:
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def span_hash_fnv(table: pa.Table, span_col: str = "spans", id_col: str = "doc_id") -> str:
    """Row-order-insensitive, span-order-SENSITIVE corpus hash with a
    fully SQL-replayable spec (every step is FNV/splitmix mod-2^64
    integer math — pipelines/oracle_sql.span_roundtrip_sql regenerates it
    from the fixture draws alone):

        span_h  = finish(FNV1a(kind || US || text || US || media_ref)
                         + uint64(offset))           # US = '\\x1f'
        doc_h   = finish(sum_i span_h_i * B^pos_i + FNV1a(doc_id))
        corpus  = xor over docs of doc_h, as %016x   # B = FNV prime

    ``span_hash_of`` (polars row hashing) remains the fast path for the
    16M-doc write manifests; this one is the ORACLE-GRADE variant the
    round-trip gate uses."""
    if span_col not in table.column_names:
        return "no-spans"
    spans = table[span_col]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    n = table.num_rows
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    B = np.uint64(0x100000001B3)
    doc_fold = np.zeros(n, dtype=np.uint64)
    if len(flat):
        us = "\x1f"
        kind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
        text = np.asarray(flat.field("text").to_pylist(), dtype=object)
        ref = np.asarray(flat.field("media_ref").to_pylist(), dtype=object)
        joined = np.array(
            [f"{k}{us}{t}{us}{r}" for k, t, r in zip(kind, text, ref)],
            dtype=object,
        )
        off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.uint64)
        span_h = _splitmix_finish(_fnv1a_codepoints(joined) + off)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], counts)
        powers = np.ones(len(flat), dtype=np.uint64)
        rem = pos.copy()
        b = int(B)
        for _ in range(max(1, int(pos.max(initial=0)).bit_length())):
            odd = (rem & 1) == 1
            powers[odd] *= np.uint64(b)
            rem >>= 1
            b = (b * b) & ((1 << 64) - 1)
        folded = span_h * powers
        # see span_hash_of: reduceat at non-empty starts only, so a
        # trailing zero-span doc can't truncate the last real segment
        nonempty = counts > 0
        starts = offsets[:-1][nonempty]
        if starts.size:
            doc_fold[nonempty] = np.add.reduceat(folded, starts)
    ids = _fnv1a_codepoints(
        np.asarray(table[id_col].to_pylist(), dtype=object)
    )
    doc_h = _splitmix_finish(doc_fold + ids)
    acc = np.bitwise_xor.reduce(doc_h) if n else np.uint64(0)
    return f"{int(acc):016x}"


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def completed(self) -> dict[str, PartitionRecord]:
        out = {}
        for f in os.listdir(self.dir):
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    d = json.load(fh)
                out[d["key"]] = PartitionRecord(**d)
        return out

    def pending_keys(self, keys: list[str], input_fingerprint: str) -> list[str]:
        """Anti-join: keys without a matching completed manifest row."""
        done = self.completed()
        return [
            k
            for k in keys
            if k not in done or done[k].input_fingerprint != input_fingerprint
        ]

    def write_partition(
        self, key: str, table: pa.Table, input_fingerprint: str
    ) -> PartitionRecord:
        """Atomically write one partition's data + manifest row."""
        import time

        t0 = time.monotonic()
        part_dir = os.path.join(self.out_dir, f"part={key}")
        tmp = tempfile.mkdtemp(dir=self.out_dir, prefix=f".tmp-{key}-")
        try:
            pq.write_table(table, os.path.join(tmp, "data.parquet"))
            nbytes = os.path.getsize(os.path.join(tmp, "data.parquet"))
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
            os.rename(tmp, part_dir)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        rec = PartitionRecord(
            key=key,
            input_fingerprint=input_fingerprint,
            row_count=table.num_rows,
            span_hash=span_hash_of(table),
            elapsed_s=round(time.monotonic() - t0, 4),
            bytes_written=nbytes,
        )
        tmp_json = os.path.join(self.dir, f".part-{key}.json.tmp")
        with open(tmp_json, "w") as fh:
            json.dump(rec.__dict__, fh)
        os.rename(tmp_json, os.path.join(self.dir, f"part-{key}.json"))
        return rec

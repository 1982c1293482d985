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


def span_hash_of(table: pa.Table, span_col: str = "spans", id_col: str = "doc_id") -> str:
    """Order-insensitive hash of the per-row span sequences.

    Hashes each row's (doc_id, serialized spans) then XOR-reduces, so the
    value is stable under row reordering but changes if any row's span
    sequence (kind, text, media_ref, order) changes — the per-row invariant
    from BASELINE.json input_hint.
    """
    if span_col not in table.column_names:
        return "no-spans"
    import hashlib

    acc = 0
    ids = table[id_col].to_pylist()
    spans = table[span_col].to_pylist()
    for i, s in zip(ids, spans):
        payload = json.dumps([i, s], sort_keys=True, default=str).encode()
        acc ^= int.from_bytes(hashlib.sha256(payload).digest()[:16], "big")
    return f"{acc:032x}"


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
        part_dir = os.path.join(self.out_dir, f"part={key}")
        tmp = tempfile.mkdtemp(dir=self.out_dir, prefix=f".tmp-{key}-")
        try:
            pq.write_table(table, os.path.join(tmp, "data.parquet"))
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
        )
        tmp_json = os.path.join(self.dir, f".part-{key}.json.tmp")
        with open(tmp_json, "w") as fh:
            json.dump(rec.__dict__, fh)
        os.rename(tmp_json, os.path.join(self.dir, f"part-{key}.json"))
        return rec

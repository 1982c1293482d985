"""Synthesize a K-times-scaled copy of a testdata sf directory for the
oracle sweep at 10x gate scale (VERDICT r4 item 9). The driver's testdata
is read-only and tops out at sf0.1, so a larger deterministic corpus is
derived from it by replication:

- region/nation are TPC-H fixed dimensions: copied unchanged.
- every other table is replicated K times with per-copy key offsets, FK
  columns offset by the SAME per-table constant so referential structure
  is preserved (copy i's orders point at copy i's customers, etc.).
- price/value float columns get a per-copy dyadic perturbation
  (copy * 2^-20, exact in float64) so top-k / argmax boundaries stay
  tie-free; it vanishes under round(x, <=4) so rounded aggregates remain
  comparable across copies.
- embeddings get copy * 2^-10 added to component 0 so cosine top-k has
  no exact ties between clones.

Both the Ray queries and the DuckDB oracles read the SAME files, so any
perturbation choice is correctness-neutral; the sweep's purpose is to
surface cardinality-dependent bugs (overflow, bucket skew, driver
materialization) that sf0.01/sf0.1 can't.

Usage: python scripts/make_sf_scaled.py [out_dir] [K]
  defaults: /tmp/graft_sf1  K=10, source /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

# per-table primary key -> offset constant (next power of 10 above the
# sf0.1 max, so scaled ids stay small enough for every downstream
# composite-key trick: doc_id < 1e5 after 10 copies)
KEYS = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000, "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
}
PERTURB = {  # float columns given a +copy*2^-20 dyadic nudge
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice"],
    "events": ["value"],
}
FIXED = ["region", "nation"]


def scale_table(name: str, tbl: pa.Table, k: int) -> pa.Table:
    copies = []
    eps = 2.0 ** -20
    for i in range(k):
        t = tbl
        for col, off in KEYS.get(name, {}).items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(i * off, type=t.schema.field(col).type))
            t = t.set_column(idx, col, shifted)
        for col in PERTURB.get(name, []):
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pc.add(t.column(col), pa.scalar(i * eps, type=pa.float64())))
        if name == "documents" and i > 0:
            # prepend a per-copy tag word to the TEXT (and keep n_chars
            # consistent): without it every clone family shares ten
            # byte-identical texts, which drives the text-dedup queries
            # (incremental prefix dedup, boilerplate chunk counts) to
            # ALL-duplicate degenerate outputs — the first sweep at 10x
            # returned legitimately-empty results on both sides instead
            # of exercising the operators' semantics at scale. The tag
            # changes the 10-char blocking prefix AND shifts the 5-word
            # chunk windows, so copies are near- but not exact dups.
            tag = pa.scalar(f"c{i} ")
            idx = t.schema.get_field_index("text")
            tagged = pc.binary_join_element_wise(tag, t.column("text"), "")
            t = t.set_column(idx, "text", tagged)
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(
                nidx, "n_chars",
                pc.add(t.column("n_chars"), pa.scalar(len(f"c{i} "), type=pa.int64())),
            )
        if name == "embeddings" and i > 0:
            emb = t.column("embedding").combine_chunks()
            vals = np.array(emb.values, dtype=np.float32, copy=True)
            dim = len(vals) // len(t)
            vals[::dim] += np.float32(i * 2.0 ** -10)
            fixed = pa.ListArray.from_arrays(emb.offsets, pa.array(vals, type=pa.float32()))
            t = t.set_column(t.schema.get_field_index("embedding"), "embedding", fixed)
        copies.append(t)
    return pa.concat_tables(copies)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    for name in FIXED + sorted(KEYS):
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        scaled = tbl if name in FIXED else scale_table(name, tbl, k)
        pq.write_table(scaled, os.path.join(out, f"{name}.parquet"), row_group_size=131072)
        print(f"{name}: {len(tbl)} -> {len(scaled)} rows")


if __name__ == "__main__":
    main()

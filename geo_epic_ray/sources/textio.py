"""JSONL / CSV corpus IO — the interchange formats a training-data
pipeline actually receives corpora in (one JSON object per line, or
quoted CSV), as first-class Ray Data sources/sinks alongside parquet.

The reference reads its tabular inputs as CSV (geoEpic/workspace/
prepare.py run_info flow; sources/run_info.py covers that shape). These
wrappers cover the DOCUMENT-corpus shape: schema-normalized reads (ids
arrive as int64, not the JSON-default double), distributed writes, and a
round-trip fidelity contract tested through the gate queries
(jsonl_roundtrip / csv_roundtrip — grouped aggregates over a converted
copy must hash-match the parquet source's oracle, including text
lengths, so quoting/escaping bugs cannot hide).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _normalize(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Cast columns to the corpus schema (JSON numbers arrive as the
    widest type the reader inferred; ids must come back int64)."""
    names = schema.names

    def cast(batch: pa.Table) -> pa.Table:
        cols = [
            batch[n].cast(schema.field(n).type) if n in batch.column_names else None
            for n in names
        ]
        if any(c is None for c in cols):
            missing = [n for n, c in zip(names, cols) if c is None]
            raise ValueError(f"corpus file missing columns: {missing}")
        return pa.table(dict(zip(names, cols)))

    return ds.map_batches(cast, batch_format="pyarrow")


def read_jsonl_docs(path: str, schema: pa.Schema = DOC_SCHEMA) -> rd.Dataset:
    """Read a JSONL document corpus (one object per line, a file or a
    directory of *.json/*.jsonl shards) with schema normalization."""
    return _normalize(rd.read_json(path), schema)


def write_jsonl_docs(ds: rd.Dataset, out_dir: str) -> None:
    """Distributed JSONL write (one shard per block)."""
    ds.write_json(out_dir)


def read_csv_docs(path: str, schema: pa.Schema = DOC_SCHEMA) -> rd.Dataset:
    """Read a CSV document corpus (quoted; Arrow CSV dialect) with schema
    normalization. ``newlines_in_values`` is ON: document text legally
    contains newlines, and Arrow's default chunked parser would split a
    block inside a quoted value and fail on column count."""
    from pyarrow import csv as pacsv

    return _normalize(
        rd.read_csv(path, parse_options=pacsv.ParseOptions(newlines_in_values=True)),
        schema,
    )


def write_csv_docs(ds: rd.Dataset, out_dir: str) -> None:
    ds.write_csv(out_dir)


def ensure_converted(
    sf_dir: str, fmt: str, scratch_root: str = "/tmp/graft_textio"
) -> str:
    """Idempotently materialize a JSONL/CSV copy of ``sf_dir``'s documents
    table (marker-gated, like bench.ensure_corpus); returns the shard
    directory. The copy is the INPUT of the round-trip gate queries."""
    import hashlib

    import shutil

    # cache key = path + source-file identity (size, mtime): a corpus
    # REBUILT in place at the same path must not serve the stale
    # converted copy (bit the 100x sweep when /tmp/graft_sf1 was
    # regenerated with perturbed text — roundtrips compared old text
    # against the new parquet)
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    ident = f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    tag = hashlib.md5(ident.encode()).hexdigest()[:8]
    out = os.path.join(scratch_root, f"{fmt}_{tag}")
    # marker is a SIBLING of the shard dir: a stray non-data file inside
    # the directory breaks extension-less directory reads (read_csv)
    marker = out + ".done"
    if os.path.exists(marker):
        return out
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    # crash-safe: write into a temp dir and rename — a killed first run
    # must not leave partial shards a retry would APPEND fresh UUID-named
    # files next to (permanently duplicated rows under a valid marker)
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if fmt == "jsonl":
        write_jsonl_docs(docs, tmp)
    elif fmt == "csv":
        write_csv_docs(docs, tmp)
    else:
        raise ValueError(fmt)
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out

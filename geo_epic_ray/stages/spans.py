"""First-class operators over the interleaved spans column.

The corpus's primary payload is ``spans: list<struct<kind, text,
media_ref, offset>>`` (BASELINE.json input_hint), with the per-row
invariant that every pipeline must preserve the span sequence
(kind, text, media_ref, order) bit-for-bit. These operators make the
nested column directly processable WITHOUT breaking that invariant:

- ``explode_spans``: doc-major long table (one row per span) via
  zero-copy Arrow list flatten — the entry point for span-level
  transforms (per-kind filtering, media decode, text analysis).
- ``filter_spans``: keep only spans of given kinds INSIDE the list
  column (list re-slice, relative order preserved) — no explode needed.
- ``reassemble_spans``: inverse of explode — bucketed group by doc,
  in-group sort by the original span index, rebuild list<struct>.
  Round-trip bit-exactness (explode -> reassemble == identity under
  state.manifest.span_hash_of) is locked in tests.
- ``span_stats``: per-doc span counts / text lengths, vectorized from
  the list offsets (never materializes per-row Python objects).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

SPAN_FIELDS = ["kind", "text", "media_ref", "offset"]


def _spans_array(batch: pa.Table, span_col: str) -> pa.ListArray:
    spans = batch[span_col]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    return spans


def explode_spans(
    ds: rd.Dataset, *, span_col: str = "spans", id_col: str = "doc_id"
) -> rd.Dataset:
    """One row per span: (doc_id, span_idx, kind, text, media_ref,
    offset). ``span_idx`` is the 0-based position within the doc — the
    key that makes reassembly exact."""

    def f(batch: pa.Table) -> pa.Table:
        spans = _spans_array(batch, span_col)
        flat = spans.flatten()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        doc_rep = pc.take(batch[id_col], pa.array(np.repeat(np.arange(len(counts)), counts)))
        span_idx = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], counts)
        cols = {id_col: doc_rep, "span_idx": pa.array(span_idx)}
        for name in SPAN_FIELDS:
            cols[name] = flat.field(name)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def filter_spans(
    ds: rd.Dataset, kinds: list[str], *, span_col: str = "spans"
) -> rd.Dataset:
    """Keep only spans whose kind is in ``kinds``, preserving relative
    order inside each doc's list — the list column is re-sliced in place
    (docs whose spans all drop keep an empty list)."""
    keep = set(kinds)

    def f(batch: pa.Table) -> pa.Table:
        spans = _spans_array(batch, span_col)
        flat = spans.flatten()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        mask = pc.is_in(flat.field("kind"), value_set=pa.array(sorted(keep))).to_numpy(
            zero_copy_only=False
        )
        kept_flat = flat.filter(pa.array(mask))
        # new offsets: cumulative kept-count per doc
        kept_per_doc = np.add.reduceat(
            mask.astype(np.int64), np.minimum(offsets[:-1], max(len(flat) - 1, 0))
        ) if len(flat) else np.zeros(len(counts), dtype=np.int64)
        kept_per_doc[counts == 0] = 0
        new_offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
        new_spans = pa.ListArray.from_arrays(pa.array(new_offsets), kept_flat)
        out = batch.set_column(
            batch.schema.get_field_index(span_col),
            pa.field(span_col, new_spans.type),
            new_spans,
        )
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def reassemble_spans(
    long_ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    span_col: str = "spans",
    n_buckets: int = 32,
) -> rd.Dataset:
    """Inverse of ``explode_spans``: hash-bucket the long rows by doc id
    (ONE shuffle), then rebuild each doc's list<struct> sorted by
    span_idx. The output spans sequence is bit-identical to the
    pre-explode input (span-sequence invariant), verified in tests via
    state.manifest.span_hash_of. Docs with ZERO spans have no long rows
    and are therefore absent from the reassembled table — keep a doc
    roster on the side if empty docs must survive."""

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (
            pd.util.hash_array(b[id_col].to_numpy()) % np.uint64(n_buckets)
        ).astype("int64")
        return b

    def rebuild(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__bucket").sort_values(
            [id_col, "span_idx"], kind="stable"
        )
        ids, starts = np.unique(g[id_col].to_numpy(), return_index=True)
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        flat = pa.StructArray.from_arrays(
            [
                pa.array(g["kind"].to_numpy(), pa.string()),
                pa.array(g["text"].to_numpy(), pa.string()),
                pa.array(g["media_ref"].to_numpy(), pa.string()),
                pa.array(g["offset"].to_numpy().astype(np.int32), pa.int32()),
            ],
            names=SPAN_FIELDS,
        )
        spans = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)), flat
        )
        return pa.table({id_col: pa.array(ids), span_col: spans})

    return (
        long_ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(rebuild, batch_format="pandas")
    )


def span_stats(
    ds: rd.Dataset, *, span_col: str = "spans", id_col: str = "doc_id"
) -> rd.Dataset:
    """Per-doc span statistics from the list offsets — (doc_id, n_spans,
    n_text_spans, n_media_spans, text_chars) with no per-row Python."""

    def f(batch: pa.Table) -> pa.Table:
        spans = _spans_array(batch, span_col)
        flat = spans.flatten()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        # the span fields are nullable: a null kind/text would surface as
        # NaN from to_numpy and astype(int64) would silently emit garbage
        # (e.g. -2^63) — count nulls as not-text / zero-length
        is_text = pc.fill_null(
            pc.equal(flat.field("kind"), "text"), False
        ).to_numpy(zero_copy_only=False)
        tlen = pc.fill_null(
            pc.utf8_length(flat.field("text")), 0
        ).to_numpy(zero_copy_only=False)
        starts = np.minimum(offsets[:-1], max(len(flat) - 1, 0))
        if len(flat):
            n_text = np.add.reduceat(is_text.astype(np.int64), starts)
            chars = np.add.reduceat(tlen.astype(np.int64), starts)
            n_text[counts == 0] = 0
            chars[counts == 0] = 0
        else:
            n_text = np.zeros(len(counts), dtype=np.int64)
            chars = np.zeros(len(counts), dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_spans": pa.array(counts),
                "n_text_spans": pa.array(n_text),
                "n_media_spans": pa.array(counts - n_text),
                "text_chars": pa.array(chars),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

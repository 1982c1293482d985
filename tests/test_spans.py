"""Span operators: explode/reassemble round-trip bit-exactness (the
north-rule span-sequence invariant), in-list filtering, stats."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from geo_epic_ray.fixtures.documents import documents_batch
from geo_epic_ray.stages.spans import (
    explode_spans,
    filter_spans,
    reassemble_spans,
    span_stats,
)
from geo_epic_ray.state.manifest import span_hash_of


def _corpus(n=500):
    return documents_batch(np.arange(n, dtype=np.int64))


def test_explode_reassemble_roundtrip_bit_exact(ray_session):
    table = _corpus()
    ds = rd.from_arrow(table).repartition(4)
    rt = reassemble_spans(explode_spans(ds), n_buckets=8)
    out = pa.concat_tables(
        [pa.table(b) for b in rt.iter_batches(batch_format="pyarrow")]
    )
    assert out.num_rows == table.num_rows
    # order-insensitive across rows, order-SENSITIVE within each doc
    assert span_hash_of(out) == span_hash_of(table)


def test_filter_spans_matches_python(ray_session):
    table = _corpus(200)
    ds = rd.from_arrow(table)
    out = pa.concat_tables(
        [
            pa.table(b)
            for b in filter_spans(ds, ["text"]).iter_batches(batch_format="pyarrow")
        ]
    )
    got = {d: s for d, s in zip(out["doc_id"].to_pylist(), out["spans"].to_pylist())}
    for d, s in zip(table["doc_id"].to_pylist(), table["spans"].to_pylist()):
        want = [x for x in s if x["kind"] == "text"]
        assert got[d] == want  # relative order preserved


def test_span_stats_matches_python(ray_session):
    table = _corpus(200)
    out = span_stats(rd.from_arrow(table)).to_pandas().set_index("doc_id")
    for d, s in zip(table["doc_id"].to_pylist(), table["spans"].to_pylist()):
        row = out.loc[d]
        assert row.n_spans == len(s)
        assert row.n_text_spans == sum(1 for x in s if x["kind"] == "text")
        assert row.n_media_spans == len(s) - row.n_text_spans
        assert row.text_chars == sum(len(x["text"]) for x in s)


def test_filter_then_roundtrip(ray_session):
    # media-only view still round-trips exactly for docs that keep spans
    table = _corpus(300)
    ds = rd.from_arrow(table).repartition(2)
    media = filter_spans(ds, ["image", "audio"])
    media_tbl = pa.concat_tables(
        [pa.table(b) for b in media.iter_batches(batch_format="pyarrow")]
    )
    nonempty_ids = {
        d
        for d, s in zip(
            media_tbl["doc_id"].to_pylist(), media_tbl["spans"].to_pylist()
        )
        if s
    }
    rt = reassemble_spans(explode_spans(media), n_buckets=4)
    rt_tbl = pa.concat_tables(
        [pa.table(b) for b in rt.iter_batches(batch_format="pyarrow")]
    )
    assert set(rt_tbl["doc_id"].to_pylist()) == nonempty_ids
    keep = media_tbl.filter(
        pa.array([d in nonempty_ids for d in media_tbl["doc_id"].to_pylist()])
    )
    assert span_hash_of(rt_tbl) == span_hash_of(keep)


def test_span_hash_fnv_properties():
    """The oracle-grade hash (manifest.span_hash_fnv): row-order
    INSENSITIVE, span-order SENSITIVE, and sensitive to every span field
    — the exact invariant the round-trip gate relies on."""
    import pyarrow as pa

    from geo_epic_ray.fixtures.documents import documents_batch
    from geo_epic_ray.state.manifest import span_hash_fnv

    t = documents_batch(np.arange(50, dtype=np.int64))
    h0 = span_hash_fnv(t)

    # row order must not matter
    perm = t.take(list(reversed(range(t.num_rows))))
    assert span_hash_fnv(perm) == h0

    def rebuild(mutate):
        rows = t.to_pylist()
        mutate(rows)
        return pa.Table.from_pylist(rows, schema=t.schema)

    # find a doc with >= 2 spans and swap them: hash must change
    rows0 = t.to_pylist()
    multi = next(i for i, r in enumerate(rows0) if len(r["spans"]) >= 2)

    def swap(rows):
        s = rows[multi]["spans"]
        s[0], s[1] = s[1], s[0]

    assert span_hash_fnv(rebuild(swap)) != h0

    # each field is load-bearing
    for field, val in [("kind", "audio"), ("text", "x"), ("media_ref", "m"),
                       ("offset", 99)]:
        def mut(rows, field=field, val=val):
            rows[multi]["spans"][1][field] = val

        assert span_hash_fnv(rebuild(mut)) != h0, field

    # dropping a span changes it too
    def drop(rows):
        rows[multi]["spans"].pop()

    assert span_hash_fnv(rebuild(drop)) != h0


def test_span_hash_trailing_empty_doc_order_insensitive():
    """Regression (ADVICE r3): a table whose TRAILING docs have empty span
    lists must hash identically to any permutation of the same rows — the
    old reduceat index clamp truncated the last non-empty doc's segment."""
    import pyarrow as pa

    from geo_epic_ray.fixtures.documents import documents_batch
    from geo_epic_ray.state.manifest import span_hash_fnv, span_hash_of

    t = documents_batch(np.arange(8, dtype=np.int64))
    rows = t.to_pylist()
    rows[-1]["spans"] = []          # one trailing empty doc
    rows[-2]["spans"] = []          # two, to exercise repeated offsets
    t2 = pa.Table.from_pylist(rows, schema=t.schema)
    perm = t2.take([6, 7] + list(range(6)))  # empties first
    for fn in (span_hash_fnv, span_hash_of):
        assert fn(t2) == fn(perm), fn.__name__

    # an all-empty table still hashes (no reduceat call at all)
    rows_e = [dict(r, spans=[]) for r in rows]
    t3 = pa.Table.from_pylist(rows_e, schema=t.schema)
    for fn in (span_hash_fnv, span_hash_of):
        assert fn(t3) == fn(t3.take(list(reversed(range(8))))), fn.__name__

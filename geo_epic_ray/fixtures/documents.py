"""Deterministic interleaved-document corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:

    doc_id: string                  # "doc-%010d"
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

- Site point (lat, lon) is a pure function of the numeric doc index
  (geo.extent.doc_point), mirroring run_info's required lat/lon
  (reference: geoEpic/core/workspace.py:313-317).
- Skew knob: ``hot_frac`` of docs are remapped into 2 hot spatial cells
  (Corn-Belt-style skew) to exercise salting.
- Invariant every pipeline must preserve: the spans sequence
  (kind, text, media_ref, order) per doc, bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.extent import LAT0, LON0, doc_point
from .rng import randint, uniform

_KINDS = np.array(["text", "image", "audio"])
_VOCAB = np.array(
    "corn wheat soy rain soil yield harvest plant field grid cell tile river "
    "silt clay loam sun wind frost seed crop acre barn silo creek ridge".split()
)

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPANS_TYPE)])

# Two "hot" sub-boxes (0.1° squares) the skewed fraction lands in.
_HOT_BOXES = [(38.4, -97.3), (36.2, -98.1), ]


def documents_batch(ids: np.ndarray, seed: int = 42, hot_frac: float = 0.3) -> pa.Table:
    """Generate one Arrow batch of docs for the given int64 doc indices."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.shape[0]
    n_spans = randint(ids, seed, 1, 1, 9)  # 1..8 spans per doc
    total = int(n_spans.sum())

    # Flattened span construction.
    doc_rep = np.repeat(np.arange(n), n_spans)
    span_ord = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(n_spans)[:-1]]), n_spans
    )
    span_key = ids[doc_rep] * 131 + span_ord
    kind_ix = randint(span_key, seed, 2, 0, 3)
    # First span of every doc is text (interleaving starts with text).
    kind_ix = np.where(span_ord == 0, 0, kind_ix)
    kinds = _KINDS[kind_ix]

    w1 = _VOCAB[randint(span_key, seed, 3, 0, len(_VOCAB))]
    w2 = _VOCAB[randint(span_key, seed, 4, 0, len(_VOCAB))]
    w3 = _VOCAB[randint(span_key, seed, 5, 0, len(_VOCAB))]
    texts = np.where(
        kind_ix == 0,
        np.char.add(np.char.add(np.char.add(w1, " "), np.char.add(w2, " ")), w3),
        "",
    )
    media_ids = randint(span_key, seed, 6, 0, 1 << 31)
    media_ref = np.where(
        kind_ix != 0,
        np.char.add("media://", media_ids.astype("U10")),
        "",
    )
    offsets = span_ord.astype(np.int32)  # strictly increasing per doc

    spans = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(n_spans)]).astype(np.int32)),
        pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(media_ref, pa.string()),
                pa.array(offsets, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        ),
    )
    doc_id = pa.array(np.char.add("doc-", np.char.zfill(ids.astype("U10"), 10)))
    return pa.Table.from_arrays([doc_id, spans.cast(SPANS_TYPE)], schema=DOCS_SCHEMA)


def doc_num_of(doc_id: pa.Array | np.ndarray) -> np.ndarray:
    """Numeric index back out of the doc_id string."""
    s = np.asarray(doc_id, dtype="U")
    digits = np.char.partition(s, "-")[:, 2]
    return digits.astype(np.int64)


def doc_point_skewed(
    ids: np.ndarray, seed: int = 42, hot_frac: float = 0.3
) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) per doc index with the hot-cell skew applied."""
    lat, lon = doc_point(ids)
    hot = uniform(ids, seed, 7) < hot_frac
    which = randint(ids, seed, 8, 0, len(_HOT_BOXES))
    hlat = np.array([b[0] for b in _HOT_BOXES])[which]
    hlon = np.array([b[1] for b in _HOT_BOXES])[which]
    jlat = uniform(ids, seed, 9) * 0.1
    jlon = uniform(ids, seed, 10) * 0.1
    return (
        np.where(hot, hlat + jlat, lat),
        np.where(hot, hlon + jlon, lon),
    )

"""Multimodal (image/audio/video) stages — Ray-side plumbing is real,
codec work is stubbed.

Media payloads are opaque ``binary`` columns with typed metadata
(media_ref, media_kind, n_bytes). The decode / resize / frame-sample
stages are actor-pool ``map_batches`` classes with the production
signature (expensive codec init in ``__init__``, batched work in
``__call__``, small ``batch_size`` because rows are wide) — but the
actual pixel/sample decode is NOT implementable in this container (no
image/audio libraries), so each stage either raises
``NotImplementedError`` (default) or produces a clearly-marked
deterministic fake (``fake=True``) used by the tests to validate schema,
batching and actor wiring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..fixtures.rng import hash_u64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_kind", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media_table(refs: list[str], kinds: list[str], seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads for plumbing tests."""
    payloads = []
    for i, r in enumerate(refs):
        n = 64 + int(hash_u64(np.array([i]), seed, 90)[0] % 192)
        payloads.append(bytes((hash_u64(np.arange(n), seed, 91) % 256).astype(np.uint8)))
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "media_kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class ImageDecode:
    """media binary -> (height, width, channels, pixels). Actor-pool stage:
    ``map_batches(ImageDecode, concurrency=N, batch_size=64, num_cpus=1)``
    — batch_size SMALL because decoded rows are wide (the guide's
    memory-aware rule)."""

    def __init__(self, fake: bool = False):
        self.fake = fake  # real path would open codec handles here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image codecs are unavailable in this environment; "
                "construct with fake=True for the deterministic stand-in"
            )
        n = batch.num_rows
        idx = np.arange(n)
        h = 8 + (hash_u64(idx, 1, 92) % 8).astype(np.int64)
        w = 8 + (hash_u64(idx, 1, 93) % 8).astype(np.int64)
        pixels = [
            (hash_u64(np.arange(hh * ww * 3), 1, 94) % 256).astype(np.uint8).tobytes()
            for hh, ww in zip(h, w)
        ]
        return (
            batch.append_column("height", pa.array(h))
            .append_column("width", pa.array(w))
            .append_column("channels", pa.array(np.full(n, 3)))
            .append_column("pixels", pa.array(pixels, pa.binary()))
        )


class ImageResize:
    """(pixels, h, w) -> nearest-neighbor resize to (target, target).
    Deterministic pure-numpy implementation — real, not stubbed, since it
    needs no codec."""

    def __init__(self, target: int = 4):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        t = self.target
        for pix, h, w in zip(
            batch["pixels"].to_pylist(), batch["height"].to_pylist(), batch["width"].to_pylist()
        ):
            img = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
            yi = (np.arange(t) * h // t)[:, None]
            xi = (np.arange(t) * w // t)[None, :]
            out.append(img[yi, xi].tobytes())
        return (
            batch.drop_columns(["pixels", "height", "width"])
            .append_column("height", pa.array(np.full(batch.num_rows, t)))
            .append_column("width", pa.array(np.full(batch.num_rows, t)))
            .append_column("pixels", pa.array(out, pa.binary()))
        )


class FrameSample:
    """video binary -> every Nth frame's byte-slice (layout-only stand-in:
    real decoders are unavailable; the slicing/batching contract is what
    downstream stages depend on)."""

    def __init__(self, every_n: int = 4, frame_bytes: int = 16, fake: bool = False):
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video codecs are unavailable; construct with fake=True"
            )
        frames = []
        counts = []
        for payload in batch["payload"].to_pylist():
            fb = self.frame_bytes
            n_frames = max(1, len(payload) // fb)
            sel = list(range(0, n_frames, self.every_n))
            frames.append(b"".join(payload[i * fb : (i + 1) * fb] for i in sel))
            counts.append(len(sel))
        return batch.append_column(
            "sampled_frames", pa.array(frames, pa.binary())
        ).append_column("n_frames_sampled", pa.array(counts, pa.int64()))


def decode_pipeline(
    media: rd.Dataset, *, fake: bool, target: int = 4, concurrency: int = 2
) -> rd.Dataset:
    """The canonical multimodal chain: decode -> resize to (target,
    target), actor pools with small batches (wide rows)."""
    ds = media.map_batches(
        ImageDecode,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        fn_constructor_kwargs={"fake": fake},
    )
    return ds.map_batches(
        ImageResize,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        fn_constructor_kwargs={"target": target},
    )


class FeatureExtract:
    """Batched model inference over decoded pixels: the MODEL (here a
    deterministic random projection standing in for a vision encoder —
    real weights are a file load in production) is built ONCE per actor in
    ``__init__``; ``__call__`` runs one vectorized forward pass per batch
    (stack pixels -> normalize -> matmul -> L2-normalize). This is the
    canonical model-in-actor-init pattern: weights never re-ship per
    batch, and batch size bounds activation memory."""

    def __init__(self, dim: int = 16, target: int = 4, seed: int = 77):
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((target * target * 3, dim)) / np.sqrt(dim)
        self.in_bytes = target * target * 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix = batch["pixels"].to_pylist()
        x = np.stack([np.frombuffer(p, dtype=np.uint8) for p in pix]).astype(
            np.float64
        )
        if x.shape[1] != self.in_bytes:
            raise ValueError(f"expected {self.in_bytes} pixel bytes, got {x.shape[1]}")
        x = (x - 127.5) / 127.5
        f = x @ self.w
        f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        return batch.append_column(
            "features", pa.array(list(f), pa.list_(pa.float64()))
        )


def feature_pipeline(
    media: rd.Dataset, *, fake: bool, dim: int = 16, target: int = 4,
    concurrency: int = 2,
) -> rd.Dataset:
    """decode -> resize -> batched feature extraction (actor pools end to
    end); output rows carry a normalized ``features`` list<double> column
    ready for the ANN / embedding-dedup stages."""
    ds = decode_pipeline(media, fake=fake, target=target, concurrency=concurrency)
    return ds.map_batches(
        FeatureExtract,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        fn_constructor_kwargs={"dim": dim, "target": target},
    )

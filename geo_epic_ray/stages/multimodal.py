"""Multimodal (image/audio/video) stages.

Media payloads are opaque ``binary`` columns with typed metadata
(media_ref, media_kind, n_bytes). The decode / resize / frame-sample
stages are actor-pool ``map_batches`` classes with the production
signature (expensive codec init in ``__init__``, batched work in
``__call__``, small ``batch_size`` because rows are wide).

ALL THREE modalities decode for REAL through the pure-stdlib codecs in
stages/codecs.py: PNG (8-bit RGB/RGBA, zlib) + 24-bit BMP images,
RIFF/PCM WAV audio, and uncompressed 24-bit AVI video (raw-DIB '00db'
frames). ``fake=True`` remains on each stage as the fast deterministic
stand-in for plumbing tests; unsupported/compressed payloads raise
NotImplementedError loudly.
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
        # % must stay in uint64 (scalar uint64 % python-int promotes to
        # FLOAT64 on this numpy, corrupting the draw — see synth_audio_table)
        n = 64 + int(hash_u64(np.array([i]), seed, 90)[0] % np.uint64(192))
        payloads.append(bytes((hash_u64(np.arange(n), seed, 91) % 256).astype(np.uint8)))
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "media_kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def synth_image_table(refs: list[str], seed: int = 42, fmt: str = "mixed") -> pa.Table:
    """REAL encoded image payloads (PNG / 24-bit BMP / baseline JPEG,
    deterministic pixels) for exercising the real decode path in-sandbox.
    ``fmt``: "png", "bmp", "jpeg" (quality 95, 4:4:4), "mixed"
    (PNG/BMP alternating), or "mixed3" (PNG/BMP/JPEG rotating)."""
    from .codecs import encode_bmp, encode_png

    payloads = []
    for i, _ in enumerate(refs):
        # uint64 modulus (scalar % python-int promotes to float64 — the
        # synth_audio_table trap) so the dims are SQL-replayable draws
        h = 6 + int(hash_u64(np.array([i]), seed, 95)[0] % np.uint64(6))
        w = 6 + int(hash_u64(np.array([i]), seed, 96)[0] % np.uint64(6))
        img = (
            (hash_u64(np.arange(h * w * 3) + i * 100003, seed, 97) % 256)
            .astype(np.uint8)
            .reshape(h, w, 3)
        )
        if fmt == "jpeg" or (fmt == "mixed3" and i % 3 == 2):
            from .jpeg import encode_jpeg

            payloads.append(encode_jpeg(img, quality=95, subsampling="4:4:4"))
        elif fmt == "png" or (fmt in ("mixed", "mixed3") and i % 2 == 0):
            payloads.append(encode_png(img))
        else:
            payloads.append(encode_bmp(img))
    return pa.table(
        {
            "media_ref": pa.array(list(refs), pa.string()),
            "media_kind": pa.array(["image"] * len(refs), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def synth_audio_table(refs: list[str], seed: int = 42, rate: int = 8000) -> pa.Table:
    """REAL encoded WAV payloads (RIFF PCM 16-bit mono, deterministic
    splitmix samples) for the real audio-decode path. Sample j of ref i
    is ``hash_u64(i*4096 + j, seed, 97) % 65536 - 32768`` — pure
    per-element integer math, so a SQL oracle regenerates the exact PCM
    stream (see oracle_sql.audio_stats_sql)."""
    from .codecs import encode_wav

    payloads = []
    for i, _ in enumerate(refs):
        # % must stay in uint64: numpy promotes uint64 % python-int to
        # FLOAT64, silently corrupting the low bits of a 2^63-scale hash
        n = 400 + int(hash_u64(np.array([i]), seed, 98)[0] % np.uint64(800))
        x = (
            hash_u64(np.int64(i) * 4096 + np.arange(n), seed, 97)
            % np.uint64(65536)
        ).astype(np.int64) - 32768
        payloads.append(encode_wav(x.astype(np.int16), rate))
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "media_kind": pa.array(["audio"] * len(refs), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class AudioDecode:
    """media binary -> (n_samples, sample_rate, channels, duration_s,
    rms). Actor-pool stage like ImageDecode; the real path parses
    RIFF/PCM WAV with the pure-stdlib codec (stages/codecs.py,
    sample-exact round-trip tests). RMS and duration are exact: the sum
    of squared int16 samples stays under 2^53, so float64 accumulation
    is integer-exact regardless of order, and both round half-to-even
    to 6 — which is what lets the gate query carry a bit-exact DuckDB
    oracle for a binary-codec stage. ``fake=True`` keeps a codec-free
    stand-in (n_bytes-derived pseudo stats)."""

    def __init__(self, fake: bool = False):
        from .codecs import decode_wav

        self._decode = decode_wav
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.fake:
            nb = batch["n_bytes"].to_numpy(zero_copy_only=False)
            ns = np.maximum(1, (nb - 44) // 2)
            rate = np.full(n, 8000, dtype=np.int64)
            ch = np.ones(n, dtype=np.int64)
            rms = np.round(np.sqrt(nb.astype(np.float64)), 6)
        else:
            ns = np.empty(n, dtype=np.int64)
            rate = np.empty(n, dtype=np.int64)
            ch = np.empty(n, dtype=np.int64)
            rms = np.empty(n, dtype=np.float64)
            for i, payload in enumerate(batch["payload"].to_pylist()):
                x, r = self._decode(payload)
                ns[i], ch[i], rate[i] = x.shape[0], x.shape[1], r
                sq = x.astype(np.float64) ** 2
                rms[i] = round(float(np.sqrt(sq.mean())), 6)
        dur = np.round(ns / np.maximum(rate, 1), 6)
        return (
            batch.append_column("n_samples", pa.array(ns))
            .append_column("sample_rate", pa.array(rate))
            .append_column("channels", pa.array(ch))
            .append_column("duration_s", pa.array(dur))
            .append_column("rms", pa.array(rms))
        )


class ImageDecode:
    """media binary -> (height, width, channels, pixels). Actor-pool stage:
    ``map_batches(ImageDecode, concurrency=N, batch_size=64, num_cpus=1)``
    — batch_size SMALL because decoded rows are wide (the guide's
    memory-aware rule).

    Real path: PNG (8-bit RGB/RGBA), 24-bit BMP and baseline JPEG via
    the pure-stdlib codecs (stages/codecs.py, stages/jpeg.py); sniffed
    per payload by magic bytes, so mixed-format corpora decode in one
    stage. Other formats raise NotImplementedError (no image libraries
    in-sandbox).
    ``fake=True`` keeps the deterministic stand-in (fast, codec-free)."""

    def __init__(self, fake: bool = False):
        # real codec state is stdlib-only; a production build would open
        # codec handles / warm a decoder pool here, once per actor
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.fake:
            idx = np.arange(n)
            h = 8 + (hash_u64(idx, 1, 92) % 8).astype(np.int64)
            w = 8 + (hash_u64(idx, 1, 93) % 8).astype(np.int64)
            chans = np.full(n, 3)
            pixels = [
                (hash_u64(np.arange(hh * ww * 3), 1, 94) % 256).astype(np.uint8).tobytes()
                for hh, ww in zip(h, w)
            ]
        else:
            from .codecs import decode_image

            h = np.empty(n, dtype=np.int64)
            w = np.empty(n, dtype=np.int64)
            chans = np.empty(n, dtype=np.int64)
            pixels = []
            for i, payload in enumerate(batch["payload"].to_pylist()):
                img = decode_image(payload)
                h[i], w[i], chans[i] = img.shape
                pixels.append(img.tobytes())
        return (
            batch.append_column("height", pa.array(h))
            .append_column("width", pa.array(w))
            .append_column("channels", pa.array(chans))
            .append_column("pixels", pa.array(pixels, pa.binary()))
        )


class ImageResize:
    """(pixels, h, w, channels) -> nearest-neighbor resize to (target,
    target). Deterministic pure-numpy implementation — real, not stubbed,
    since it needs no codec. Variable image sizes force per-image work;
    the bytes stay in the Arrow binary buffer until each image's single
    zero-copy ``np.frombuffer`` view."""

    def __init__(self, target: int = 4):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        t = self.target
        pix_arr = batch["pixels"].combine_chunks()
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        cs = (
            batch["channels"].to_numpy(zero_copy_only=False)
            if "channels" in batch.column_names
            else np.full(batch.num_rows, 3)
        )
        for i in range(batch.num_rows):
            h, w, c = int(hs[i]), int(ws[i]), int(cs[i])
            img = np.frombuffer(pix_arr[i].as_buffer(), dtype=np.uint8).reshape(h, w, c)
            yi = (np.arange(t) * h // t)[:, None]
            xi = (np.arange(t) * w // t)[None, :]
            out.append(img[yi, xi].tobytes())
        return (
            batch.drop_columns(["pixels", "height", "width"])
            .append_column("height", pa.array(np.full(batch.num_rows, t)))
            .append_column("width", pa.array(np.full(batch.num_rows, t)))
            .append_column("pixels", pa.array(out, pa.binary()))
        )


def synth_video_table(refs: list[str], seed: int = 42, fps: int = 10) -> pa.Table:
    """REAL encoded uncompressed-AVI payloads (raw-DIB frames,
    deterministic splitmix pixels) for the real video-decode path. Video
    i: n_frames = 4 + draw(101)%6, h = 4 + draw(102)%4, w = 4 + draw(103)%4,
    pixel at flat index q (frame-major RGB) = hash_u64(q + i*100003, seed,
    104) % 256 — pure integer math, SQL-replayable like the image/audio
    fixtures."""
    from .codecs import encode_avi

    payloads = []
    for i, _ in enumerate(refs):
        nf = 4 + int(hash_u64(np.array([i]), seed, 101)[0] % np.uint64(6))
        h = 4 + int(hash_u64(np.array([i]), seed, 102)[0] % np.uint64(4))
        w = 4 + int(hash_u64(np.array([i]), seed, 103)[0] % np.uint64(4))
        pix = (
            (hash_u64(np.arange(nf * h * w * 3) + i * 100003, seed, 104) % 256)
            .astype(np.uint8)
            .reshape(nf, h, w, 3)
        )
        payloads.append(encode_avi(pix, fps=fps))
    return pa.table(
        {
            "media_ref": pa.array(list(refs), pa.string()),
            "media_kind": pa.array(["video"] * len(refs), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class FrameSample:
    """video binary -> every Nth frame, REAL: the pure-stdlib
    uncompressed-AVI codec (stages/codecs.py, frame-exact round-trip
    tests) decodes each payload in the actor pool and the sampled frames'
    RGB bytes are emitted with (n_frames, height, width, fps). Compressed
    streams raise NotImplementedError loudly. ``fake=True`` keeps the
    codec-free byte-slicing stand-in for plumbing tests."""

    def __init__(self, every_n: int = 4, frame_bytes: int = 16, fake: bool = False):
        from .codecs import decode_avi

        self._decode = decode_avi
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
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
        n = batch.num_rows
        frames = []
        counts = np.empty(n, dtype=np.int64)
        nf = np.empty(n, dtype=np.int64)
        hh = np.empty(n, dtype=np.int64)
        ww = np.empty(n, dtype=np.int64)
        fps = np.empty(n, dtype=np.int64)
        for i, payload in enumerate(batch["payload"].to_pylist()):
            vid, rate = self._decode(payload)
            sel = vid[:: self.every_n]
            frames.append(sel.tobytes())
            counts[i] = sel.shape[0]
            nf[i], hh[i], ww[i] = vid.shape[0], vid.shape[1], vid.shape[2]
            fps[i] = rate
        return (
            batch.append_column("sampled_frames", pa.array(frames, pa.binary()))
            .append_column("n_frames_sampled", pa.array(counts))
            .append_column("n_frames", pa.array(nf))
            .append_column("height", pa.array(hh))
            .append_column("width", pa.array(ww))
            .append_column("fps", pa.array(fps))
        )


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

"""Pure-Python image codecs (no external libraries): 24-bit BMP and
8-bit PNG (RGB/RGBA, via zlib). These make ImageDecode's real path work
in-sandbox — the container has no image libraries, but BMP is plain
bytes and PNG's DEFLATE lives in the stdlib.

Scope (documented, asserted loudly):
- BMP: uncompressed 24-bit BI_RGB, bottom-up or top-down rows.
- PNG: bit depth 8, color type 2 (RGB) or 6 (RGBA), non-interlaced.
  All five row filters are decoded; filters 0/1/2 vectorize fully
  (none / cumsum-sub / up), 3/4 (average/Paeth) fall back to a per-pixel
  row loop — the encoders below emit filter 0, so synthesized corpora
  stay on the vectorized path.

Encoders exist to synthesize deterministic test/bench payloads
(`encode_bmp`, `encode_png`); they are byte-valid files any external
viewer can open.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --- BMP ----------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows,
    4-byte row padding, BGR channel order on disk)."""
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    row_len = (w * 3 + 3) & ~3
    pad = row_len - w * 3
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * row_len, offset=data_off)
    rows = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


# --- PNG ----------------------------------------------------------------------


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> PNG bytes (bit depth 8, filter 0 rows)."""
    h, w, c = img.shape
    if c not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3|4) uint8")
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * c), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * c)  # leading 0 = filter "none"
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_rows(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters. raw: (h, 1 + stride) uint8 (filter byte +
    row). Filters none/sub/up vectorize; average/Paeth loop per pixel."""
    filters = raw[:, 0]
    rows = raw[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        r = rows[y]
        if f == 0:
            pass
        elif f == 1:  # sub: recon[x] = raw[x] + recon[x-bpp] -> cumsum per lane
            for off in range(bpp):
                r[off::bpp] = np.cumsum(r[off::bpp], dtype=np.int64) % 256
        elif f == 2:  # up
            r += prev  # uint8 wraps, exactly PNG's mod-256 semantics
        elif f == 3:  # average (sequential in x)
            for x in range(stride):
                left = int(r[x - bpp]) if x >= bpp else 0
                r[x] = (int(r[x]) + (left + int(prev[x])) // 2) % 256
        elif f == 4:  # Paeth (sequential in x)
            for x in range(stride):
                a = int(r[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
                r[x] = (int(r[x]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        prev = r
    return rows


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3|4) uint8. Bit depth 8, color type 2/6,
    non-interlaced only (the formats `encode_png` produces)."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    idat = []
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        kind = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif kind == b"IDAT":
            idat.append(payload)
        elif kind == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA non-interlaced PNG (depth={depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    c = 3 if color_type == 2 else 4
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG data length mismatch")
    rows = _unfilter_rows(raw.reshape(h, 1 + stride), h, stride, c)
    return rows.reshape(h, w, c)


def decode_image(buf: bytes) -> np.ndarray:
    """Sniff the magic bytes and decode: PNG, BMP or baseline JPEG ->
    (h, w, c) uint8."""
    if buf[:8] == PNG_SIG:
        return decode_png(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(buf)
    raise NotImplementedError(
        "unrecognized image format (PNG, 24-bit BMP and baseline JPEG "
        "decode in-sandbox; other codecs need an image library)"
    )


# --- WAV (RIFF PCM) -----------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Byte-valid RIFF/WAVE, PCM 16-bit. ``samples``: (n,) int16 mono or
    (n, ch) int16 interleaved-on-write."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    data = x.reshape(-1).astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Byte-valid uncompressed AVI (RIFF 'AVI '): one video stream,
    24-bit BI_RGB DIB frames ('00db' chunks, bottom-up BGR rows with
    4-byte padding — the same pixel layout decode_bmp handles), plus the
    standard idx1 index. ``frames``: (n, h, w, 3) uint8 RGB."""
    x = np.asarray(frames)
    if x.ndim != 4 or x.shape[3] != 3 or x.dtype != np.uint8:
        raise ValueError("encode_avi expects (n, h, w, 3) uint8")
    n, h, w, _ = x.shape
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((n, h, row_len), dtype=np.uint8)
    rows[:, :, : w * 3] = x[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    frame_bytes = rows.reshape(n, -1)
    fsize = h * row_len

    def lst(kind: bytes, payload: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(payload) + 4) + kind + payload

    def chk(kind: bytes, payload: bytes) -> bytes:
        out = kind + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) & 1 else b"")

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, fsize * fps, 0, 0x10, n, 0, 1, fsize, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, fsize, -1, fsize,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chk(b"avih", avih) + lst(b"strl", chk(b"strh", strh) + chk(b"strf", strf)),
    )
    movi_payload = b""
    offsets = []
    for f in range(n):
        offsets.append(len(movi_payload) + 4)  # offset from 'movi' fourcc
        movi_payload += chk(b"00db", frame_bytes[f].tobytes())
    movi = lst(b"movi", movi_payload)
    idx1 = b"".join(
        b"00db" + struct.pack("<III", 0x10, off, fsize) for off in offsets
    )
    body = b"AVI " + hdrl + movi + chk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(buf: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed 24-bit AVI bytes -> ((n, h, w, 3) uint8 RGB, fps).
    Raw-DIB '00db'/'00dc' frames only; compressed streams raise
    NotImplementedError loudly (no video libraries in-sandbox)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    w = h = None
    rate = scale = None
    bpp = compression = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, rate, scale, bpp, compression
        while pos + 8 <= end:
            kind = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            if kind == b"LIST":
                walk(body_start + 4, body_start + size)
            elif kind == b"strh":
                fcc = buf[body_start : body_start + 4]
                if fcc == b"vids":
                    scale, rate = struct.unpack(
                        "<II", buf[body_start + 20 : body_start + 28]
                    )
            elif kind == b"strf":
                hdr = struct.unpack("<IiiHHI", buf[body_start : body_start + 20])
                w, h, bpp, compression = hdr[1], abs(hdr[2]), hdr[4], hdr[5]
            elif kind[2:4] == b"db" or kind[2:4] == b"dc":
                frames.append(buf[body_start : body_start + size])
                if kind[2:4] == b"dc" and compression not in (0, None):
                    raise NotImplementedError(
                        f"compressed AVI stream (biCompression={compression})"
                    )
            pos = body_start + size + (size & 1)

    walk(12, 12 + struct.unpack("<I", buf[4:8])[0] - 4)
    if w is None or bpp is None:
        raise NotImplementedError("AVI missing strf header")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit AVI (bpp={bpp}, compression={compression})"
        )
    if not rate or not scale:
        raise NotImplementedError("AVI missing vids strh rate/scale")
    row_len = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for f, data in enumerate(frames):
        if len(data) != h * row_len:
            raise NotImplementedError(
                f"frame {f}: {len(data)} bytes != expected DIB size {h * row_len}"
            )
        rows = np.frombuffer(data, dtype=np.uint8).reshape(h, row_len)
        out[f] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return out, int(round(rate / scale))


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """(samples (n, ch) int16, rate). PCM 16-bit only — asserted loudly."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        kind = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        chunk = buf[pos + 8 : pos + 8 + size]
        if kind == b"fmt ":
            tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            if tag != 1:
                raise NotImplementedError(f"only PCM WAV (got format tag {tag})")
        elif kind == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if data is None or rate is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"only 16-bit PCM (got {bits})")
    if ch is None or ch < 1:
        raise NotImplementedError(f"malformed fmt chunk: channels={ch}")
    if len(data) % (2 * ch):
        raise NotImplementedError(
            f"data chunk length {len(data)} not a multiple of frame size {2 * ch}"
        )
    x = np.frombuffer(data, dtype="<i2")
    return x.reshape(-1, ch), int(rate)

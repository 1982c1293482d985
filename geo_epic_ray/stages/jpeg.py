"""Baseline JPEG codec (ITU-T T.81 sequential DCT + Huffman), pure
numpy/stdlib — no image libraries exist in this environment.

Why it exists: real interleaved multimodal corpora are JPEG-dominated;
the engine's image path previously handled only the lossless PNG/BMP
codecs (stages/codecs.py). The reference has no codec layer at all (it
shells out to GDAL/rasterio, geoEpic/utils/raster_utils.py:33-51), so
this closes a brief-driven gap, not a reference-parity one.

Decoder scope (loud ``NotImplementedError`` outside it):
- baseline/extended sequential Huffman (SOF0/SOF1), 8-bit samples
- 1 or 3 components, sampling factors 1 or 2 per axis (4:4:4, 4:2:2,
  4:2:0, ...), chroma upsampled by pixel replication
- multiple DQT/DHT segments, 8- or 16-bit quant tables, restart
  intervals (DRI/RSTn), APPn/COM skipped
- NOT: progressive (SOF2), arithmetic coding (SOF9+), hierarchical,
  12-bit precision

Encoder scope: RGB (h, w, 3) or grayscale (h, w) uint8; 4:4:4 or 4:2:0;
libjpeg-style quality scaling of the Annex-K quantization tables;
per-image OPTIMIZED Huffman tables (frequency-counted, length-limited
canonical codes, all-ones code reserved per the spec's Adjust_BITS) —
nothing depends on recalling the Annex-K Huffman tables correctly.
Output is deterministic for a given (pixels, quality, subsampling).

Entropy decoding is a per-symbol Python loop (inherently sequential);
everything block-shaped (FDCT/IDCT, quantize, color convert, upsample)
is vectorized numpy over all blocks at once. At 100 TB the per-image
work parallelizes across actor-pool workers — single-image latency is
dominated by payload size, not this loop, for the thumbnail-scale
payloads the gates use.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants ---------------------------------------------------------------

# Annex K.1 base quantization tables (the quality knob scales these).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag() -> np.ndarray:
    """Flat indices (row*8+col) in zigzag order, derived from the
    diagonal-walk rule rather than typed as a literal."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = rng if s % 2 else reversed(rng)
        out.extend(r * 8 + (s - r) for r in rows)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()  # natural <- zigzag position mapping
UNZIGZAG = np.argsort(ZIGZAG)

_k = np.arange(8)
# Orthonormal 8x8 DCT-II matrix: FDCT S = D @ X @ D.T, IDCT X = D.T @ S @ D.
DCT_M = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * _k[None, :] + 1) * _k[:, None] / 16)
DCT_M[0] = np.sqrt(1.0 / 8.0)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling: 1..100 -> scaled Annex-K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --- bit I/O -------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:  # pad with 1-bits to a byte boundary
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)


class _BitReader:
    """Reads the entropy-coded segment: FF00 unstuffed; stops at any
    other marker (exposed via .at_marker for RSTn handling)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.buf
        p = self.pos
        if p >= len(b):
            return False
        x = b[p]
        if x == 0xFF:
            if p + 1 < len(b) and b[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker: no more entropy bits here
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | x
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise ValueError("JPEG entropy stream truncated")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_to_marker(self) -> int:
        """Drop partial bits, expect a marker next; return its code byte."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        p = self.pos
        while p + 1 < len(b) and not (b[p] == 0xFF and b[p + 1] != 0x00):
            p += 1
        if p + 1 >= len(b):
            raise ValueError("expected a marker, hit end of stream")
        self.pos = p + 2
        return b[p + 1]


# --- Huffman -------------------------------------------------------------------


def _code_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Optimal prefix-code bit lengths (Huffman); deterministic ties."""
    import heapq

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    length = {s: 0 for s in freqs}
    heap = [(f, s, [s]) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, t1, g1 = heapq.heappop(heap)
        f2, t2, g2 = heapq.heappop(heap)
        for s in g1:
            length[s] += 1
        for s in g2:
            length[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), g1 + g2))
    return length


def build_huffman_table(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """(BITS[1..16], HUFFVAL) for the observed symbol frequencies.

    The spec's reserved-symbol trick guarantees no real symbol receives
    the all-ones code: a virtual symbol 256 with the strictly smallest
    frequency (all real counts are doubled) always lands at the maximum
    depth and is dropped from the deepest length after limiting.
    """
    work = {s: 2 * f for s, f in freqs.items() if f > 0}
    work[256] = 1
    lengths = _code_lengths(work)
    bits = [0] * 64
    for _, l in lengths.items():
        bits[l] += 1
    # Adjust_BITS (Annex K.2): fold lengths > 16 upward
    i = len(bits) - 1
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # canonical symbol order: original length asc, then symbol asc (the
    # virtual 256 sorts after every real symbol of its length)
    order = sorted(work, key=lambda s: (lengths[s], s))
    # re-assign adjusted lengths in order, then drop the reserved symbol
    new_len: dict[int, int] = {}
    li = 1
    for s in order:
        while bits[li] == 0:
            li += 1
        new_len[s] = li
        bits[li] -= 1
    del new_len[256]
    out_bits = [0] * 17
    for _, l in new_len.items():
        out_bits[l] += 1
    huffval = sorted(new_len, key=lambda s: (new_len[s], s))
    return out_bits[1:], huffval


def _encode_map(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits) from canonical (BITS, HUFFVAL)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            out[huffval[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical decode tables (F.2.2.3): mincode/maxcode/valptr."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.valptr[l] = k
                self.mincode[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.maxcode[l] = code - 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for l in range(1, 17):
            code = (code << 1) | r.read(1)
            if code <= self.maxcode[l]:
                return self.huffval[self.valptr[l] + code - self.mincode[l]]
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --- color --------------------------------------------------------------------


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- encoder -------------------------------------------------------------------


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) blocks in
    raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _quantize_blocks(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    s = np.einsum("ij,njk,lk->nil", DCT_M, blocks - 128.0, DCT_M)
    return np.round(s / q).astype(np.int64)


def _encode_component_symbols(
    coefs: np.ndarray, seg_of_block: np.ndarray | None = None
) -> tuple[list[tuple[int, int, int]], list[list[tuple[int, int, int]]]]:
    """Quantized (n, 8, 8) -> per-block DC (sym, bits, nbits) and AC
    symbol lists; DC differentials are sequential within the component
    ordering the caller uses, resetting at restart-segment boundaries
    (``seg_of_block``: restart-segment id per block, or None)."""
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    dc = zz[:, 0]
    prev = np.concatenate([[0], dc[:-1]])
    if seg_of_block is not None and dc.size:
        first = np.concatenate(
            [[True], seg_of_block[1:] != seg_of_block[:-1]]
        )
        prev[first] = 0
    diffs = dc - prev
    dc_syms: list[tuple[int, int, int]] = []
    ac_syms: list[list[tuple[int, int, int]]] = []
    for n in range(zz.shape[0]):
        d = int(diffs[n])
        size = _category(d)
        amp = d if d >= 0 else d + (1 << size) - 1
        dc_syms.append((size, amp, size))
        row = zz[n]
        acs: list[tuple[int, int, int]] = []
        run = 0
        nz = np.flatnonzero(row[1:])
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                acs.append((0xF0, 0, 0))
                run -= 16
            size = _category(v)
            amp = v if v >= 0 else v + (1 << size) - 1
            acs.append(((run << 4) | size, amp, size))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))  # EOB
        ac_syms.append(acs)
    return dc_syms, ac_syms


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 gray -> baseline JPEG bytes.
    Deterministic; per-image optimized Huffman tables. ``restart_interval``
    > 0 emits DRI + RSTn markers every that many MCUs."""
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w, 3) RGB or (h, w) gray")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise NotImplementedError(f"subsampling {subsampling!r}")
    h, w = img.shape[:2]
    qy, qc = quality_tables(quality)

    if gray:
        comps = [(1, 1, 1, 0)]  # id, H, V, quant-table
        planes = [_pad_to(img.astype(np.float64), 8, 8)]
    else:
        ycc = rgb_to_ycbcr(img)
        if subsampling == "4:4:4":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [_pad_to(ycc[..., i], 8, 8) for i in range(3)]
        else:
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            ypad = _pad_to(ycc[..., 0], 16, 16)
            cpads = []
            for i in (1, 2):
                c = _pad_to(ycc[..., i], 16, 16)
                c = c.reshape(c.shape[0] // 2, 2, c.shape[1] // 2, 2).mean((1, 3))
                cpads.append(c)
            planes = [ypad, *cpads]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # quantized blocks per component, raster block order
    comp_coefs = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        comp_coefs.append(_quantize_blocks(_blocks_of(plane), qy if tq == 0 else qc))

    # MCU interleave ordering of block indices per component
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_block_order = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        bw = plane.shape[1] // 8
        order = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(cv):
                    for bx in range(ch):
                        order.append((my * cv + by) * bw + (mx * ch + bx))
        comp_block_order.append(np.array(order, dtype=np.int64))

    # symbols computed in the INTERLEAVED order (DC diffs are sequential
    # in scan order, per component, resetting at restart boundaries)
    ri = int(restart_interval)
    comp_dc, comp_ac = [], []
    for (cid, ch, cv, tq), coefs, order in zip(
        comps, comp_coefs, comp_block_order
    ):
        rseg = None
        if ri:
            mcu_of_block = np.repeat(np.arange(order.size // (ch * cv)), ch * cv)
            rseg = mcu_of_block // ri
        dc_syms, ac_syms = _encode_component_symbols(coefs[order], rseg)
        comp_dc.append(dc_syms)
        comp_ac.append(ac_syms)

    # frequency counting: table 0 = luma (component 0), table 1 = chroma
    freq_dc = [{}, {}]
    freq_ac = [{}, {}]
    for ci in range(len(comps)):
        t = 0 if ci == 0 else 1
        for sym, _, _ in comp_dc[ci]:
            freq_dc[t][sym] = freq_dc[t].get(sym, 0) + 1
        for acs in comp_ac[ci]:
            for sym, _, _ in acs:
                freq_ac[t][sym] = freq_ac[t].get(sym, 0) + 1
    n_tables = 1 if gray else 2
    dc_tabs = [build_huffman_table(freq_dc[t]) for t in range(n_tables)]
    ac_tabs = [build_huffman_table(freq_ac[t]) for t in range(n_tables)]
    dc_maps = [_encode_map(*t) for t in dc_tabs]
    ac_maps = [_encode_map(*t) for t in ac_tabs]

    # entropy-coded segment
    bw_ = _BitWriter()
    n_mcus = mcus_x * mcus_y
    per_mcu = [c[1] * c[2] for c in comps]
    pos = [0] * len(comps)
    for _m in range(n_mcus):
        if ri and _m and _m % ri == 0:
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + ((_m // ri - 1) % 8)])
        for ci in range(len(comps)):
            t = 0 if ci == 0 else 1
            for _b in range(per_mcu[ci]):
                sym, amp, nb = comp_dc[ci][pos[ci]]
                code, cl = dc_maps[t][sym]
                bw_.write(code, cl)
                bw_.write(amp, nb)
                for asym, aamp, anb in comp_ac[ci][pos[ci]]:
                    code, cl = ac_maps[t][asym]
                    bw_.write(code, cl)
                    bw_.write(aamp, anb)
                pos[ci] += 1
    bw_.flush()

    # --- assemble the file ---
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    qzz_y = qy.reshape(-1)[ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qzz_y))
    if not gray:
        qzz_c = qc.reshape(-1)[ZIGZAG]
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qzz_c))
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += seg(0xC0, sof)
    for t in range(n_tables):
        for cls, (bits, vals) in ((0, dc_tabs[t]), (1, ac_tabs[t])):
            out += seg(
                0xC4,
                bytes([(cls << 4) | t]) + bytes(bits) + bytes(vals),
            )
    sos = bytes([len(comps)])
    for ci, (cid, _, _, _) in enumerate(comps):
        t = 0 if ci == 0 else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -------------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB ((h, w, 1) for
    grayscale streams is expanded to 3 identical channels)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, H, V, Tq)])
    while True:
        if pos + 1 >= len(buf):
            raise ValueError("JPEG truncated before SOS")
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(buf):
            raise ValueError("JPEG truncated in marker segment header")
        (seglen,) = struct.unpack_from(">H", buf, pos)
        if pos + seglen > len(buf):
            raise ValueError("JPEG truncated inside a marker segment")
        body = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(body[p : p + 128], dtype=">u2")
                    p += 128
                qt[tq] = tbl.astype(np.int64)[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 15, tq))
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            if any(c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps):
                raise NotImplementedError("sampling factors beyond 2x2")
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF type 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            pos = pos + seglen
            return _decode_scan(
                buf, pos, frame, scan, qt, huff, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += seglen


def _decode_scan(buf, pos, frame, scan, qt, huff, restart_interval):
    fh, fw, comps = frame
    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    order = []  # (comp_idx, blocks_per_mcu)
    comp_meta = []
    for ci, (cs, td, ta) in enumerate(scan):
        cid, ch, cv, tq = by_id[cs]
        bw = mcus_x * ch  # blocks per row at this component's resolution
        bh = mcus_y * cv
        comp_meta.append(
            {
                "h": ch,
                "v": cv,
                "tq": tq,
                "dc": huff[(0, td)],
                "ac": huff[(1, ta)],
                "bw": bw,
                "coef": np.zeros((bh * bw, 64), dtype=np.int64),
            }
        )

    r = _BitReader(buf, pos)
    pred = [0] * len(scan)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            mk = r.sync_to_marker()
            if not (0xD0 <= mk <= 0xD7):
                raise ValueError(f"expected RSTn, got 0x{mk:02x}")
            pred = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, meta in enumerate(comp_meta):
            for by in range(meta["v"]):
                for bx in range(meta["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    s = meta["dc"].decode(r)
                    diff = _extend(r.read(s), s) if s else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = meta["ac"].decode(r)
                        rr, ssz = rs >> 4, rs & 15
                        if ssz == 0:
                            if rs == 0xF0:
                                k += 16
                                continue
                            break  # EOB
                        k += rr
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        zz[k] = _extend(r.read(ssz), ssz)
                        k += 1
                    bi = (my * meta["v"] + by) * meta["bw"] + mx * meta["h"] + bx
                    meta["coef"][bi] = zz

    # dequantize + IDCT, vectorized per component
    planes = []
    for meta in comp_meta:
        q = qt[meta["tq"]].reshape(-1)
        nat = np.zeros_like(meta["coef"])
        nat[:, ZIGZAG] = meta["coef"]  # zigzag -> natural
        blocks = (nat * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ji,njk,kl->nil", DCT_M, blocks, DCT_M) + 128.0
        bh = meta["coef"].shape[0] // meta["bw"]
        plane = (
            pix.reshape(bh, meta["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, meta["bw"] * 8)
        )
        # upsample to full resolution by replication, crop to frame
        plane = np.repeat(
            np.repeat(plane, hmax // meta["h"], axis=1), vmax // meta["v"], axis=0
        )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])

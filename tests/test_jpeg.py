"""Baseline JPEG codec: round-trip error bounds, marker/DRI handling,
loud failures outside the documented scope, sniffer integration."""

import numpy as np
import pytest

from geo_epic_ray.stages.jpeg import (
    DCT_M,
    ZIGZAG,
    _encode_map,
    build_huffman_table,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_dct_matrix_orthonormal():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)


def test_zigzag_is_permutation_with_known_prefix():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec's first entries: (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),(0,3),(1,2)
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


def test_quality_tables_monotone_and_q100_is_ones():
    qy95, qc95 = quality_tables(95)
    qy50, _ = quality_tables(50)
    assert (qy95 <= qy50).all() and qy95.min() >= 1
    qy100, qc100 = quality_tables(100)
    assert (qy100 == 1).all() and (qc100 == 1).all()


def test_huffman_tables_canonical_and_prefix_free():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n_sym = int(rng.integers(1, 180))
        syms = rng.choice(256, size=n_sym, replace=False)
        freqs = {int(s): int(rng.integers(1, 10_000)) for s in syms}
        bits, vals = build_huffman_table(freqs)
        assert sum(bits) == len(vals) == len(freqs)
        assert sorted(vals) == sorted(freqs)
        enc = _encode_map(bits, vals)
        # Kraft strict inequality (all-ones reserved => sum < 1)
        kraft = sum(2.0 ** -l for _, l in enc.values())
        assert kraft < 1.0 + 1e-12
        # prefix-free
        codes = sorted((l, c) for c, l in enc.values())
        as_str = sorted(format(c, f"0{l}b") for l, c in codes)
        for a, b in zip(as_str, as_str[1:]):
            assert not b.startswith(a)
        # no all-ones code at any length; lengths capped at 16
        assert all(c != (1 << l) - 1 for c, l in enc.values())
        assert max(l for _, l in enc.values()) <= 16


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_roundtrip_gradient_error_bounds(sub):
    img = _gradient(37, 53)
    for q, tol in ((75, 12), (90, 8), (95, 6)):
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol, (sub, q, err.max())


def test_roundtrip_noise_and_q100_near_lossless():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    dec95 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    err95 = np.abs(dec95.astype(int) - img.astype(int))
    assert err95.max() <= 40 and err95.mean() <= 8
    # q=100 => all-ones quant tables: only transform/color rounding left
    dec100 = decode_jpeg(encode_jpeg(img, quality=100, subsampling="4:4:4"))
    assert np.abs(dec100.astype(int) - img.astype(int)).max() <= 3


def test_non_multiple_of_8_and_tiny_and_gray():
    rng = np.random.default_rng(2)
    for shape in ((6, 6), (7, 11), (8, 8), (9, 17), (16, 16), (33, 15)):
        im = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in ("4:4:4", "4:2:0"):
            dec = decode_jpeg(encode_jpeg(im, quality=95, subsampling=sub))
            assert dec.shape == im.shape, (shape, sub)
    g = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (17, 19, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 40


def test_restart_intervals_transparent():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        base = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
        for ri in (1, 2, 5, 11):
            data = encode_jpeg(
                img, quality=92, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in data  # DRI emitted
            assert np.array_equal(decode_jpeg(data), base), (sub, ri)


def test_encode_deterministic():
    img = _gradient(20, 22)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


def test_loud_failures():
    img = _gradient(16, 16)
    data = encode_jpeg(img, quality=90)
    # progressive: flip SOF0 -> SOF2
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01" + data)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
    with pytest.raises(NotImplementedError):
        encode_jpeg(img, subsampling="4:1:1")


def test_sniffer_routes_jpeg():
    from geo_epic_ray.stages.codecs import decode_image

    img = _gradient(12, 12)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_synth_image_table_mixed3_decodes():
    from geo_epic_ray.stages.codecs import decode_image
    from geo_epic_ray.stages.multimodal import hash_u64, synth_image_table

    refs = [f"r{i}" for i in range(9)]
    t = synth_image_table(refs, fmt="mixed3")
    seen = set()
    for i, payload in enumerate(t["payload"].to_pylist()):
        seen.add(payload[:2])
        img = decode_image(payload)
        h = 6 + int(hash_u64(np.array([i]), 42, 95)[0] % np.uint64(6))
        w = 6 + int(hash_u64(np.array([i]), 42, 96)[0] % np.uint64(6))
        assert img.shape == (h, w, 3)
        src = (
            (hash_u64(np.arange(h * w * 3) + i * 100003, 42, 97) % 256)
            .astype(np.uint8)
            .reshape(h, w, 3)
        )
        tol = 0 if payload[:2] != b"\xff\xd8" else 40
        assert np.abs(img.astype(int) - src.astype(int)).max() <= tol
    assert len(seen) == 3  # PNG, BMP and JPEG all present

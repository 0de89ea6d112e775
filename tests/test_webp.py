"""From-scratch WebP lossless (VP8L) codec — roundtrips over every
encoder shape, hand-crafted streams for the decoder-only features
(meta prefix codes, color transform), and the quarantine contract.

Reference parity note: the reference accepts WebP through its ffmpeg
fallback (ffmpeg.c:35-65); this container has no libwebp, so the codec
is implemented from the public spec (RFC 9649) in
mnemophonix_spark/webp.py and validated here by encode/decode
roundtrip plus adversarial bitstreams.
"""

from __future__ import annotations

import numpy as np
import pytest

from mnemophonix_spark import webp
from mnemophonix_spark.codecs import CodecError
from mnemophonix_spark.webp import (
    _Reader,
    _Writer,
    _container,
    _lz77_fwd,
    _lz77_value,
    _write_image_header,
    _write_literal_image,
    _write_prefix_code,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def _rt(img, **kw):
    out = webp.decode_webp_rgb(webp.encode_webp(img, **kw))
    assert out.dtype == np.float32
    want = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
    assert np.array_equal(out, want)
    return out


# --- roundtrips ------------------------------------------------------------


def test_roundtrip_modes_rgb(rng):
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    for mode, kw in (
        ("flat8", {}),
        ("huffman", {}),
        ("lz77", {"cache_bits": 0}),
        ("lz77", {"cache_bits": 8}),
    ):
        _rt(img, mode=mode, **kw)


def test_roundtrip_gray_input(rng):
    g = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    out = webp.decode_webp(webp.encode_webp(g))
    assert out.shape == (24, 31)
    assert np.array_equal(out, g.astype(np.float32))


def test_roundtrip_all_predictor_modes(rng):
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    for p in range(14):
        _rt(img, predictor=p)


def test_roundtrip_palette_all_bundlings(rng):
    # palette sizes straddling every sub-byte bundling tier
    for ncolors in (2, 4, 16, 17, 200):
        vals = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
        idx = rng.integers(0, ncolors, (30, 29))
        img = vals[idx]
        _rt(img, palette=True)


def test_palette_rejects_too_many_colors(rng):
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(CodecError):
        webp.encode_webp(img, palette=True)


def test_roundtrip_extreme_geometries(rng):
    for h, w in ((1, 1), (1, 64), (64, 1), (3, 257)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for mode in ("flat8", "huffman", "lz77"):
            _rt(img, mode=mode)


def test_roundtrip_uniform_histogram_regression():
    """60x78 modular gradient: every channel histogram is flat, so the
    code-length code degenerates to a SINGLE symbol — whose decode
    consumes zero bits.  The writer must emit zero bits per token too
    (it once wrote 1, desyncing the whole stream)."""
    xx, yy = np.meshgrid(np.arange(78), np.arange(60))
    img = np.stack(
        [(xx + yy) % 256, (2 * xx) % 256, (3 * yy) % 256], axis=-1
    ).astype(np.uint8)
    for mode in ("flat8", "huffman", "lz77"):
        _rt(img, mode=mode)


def test_roundtrip_constant_image():
    for val in (0, 128, 255):
        img = np.full((60, 78, 3), val, dtype=np.uint8)
        for mode in ("flat8", "huffman", "lz77"):
            _rt(img, mode=mode)


def test_lz77_actually_compresses(rng):
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    img = np.tile(tile, (8, 10, 1))
    flat8 = webp.encode_webp(img)
    lz = webp.encode_webp(img, mode="lz77", cache_bits=6)
    assert len(lz) * 5 < len(flat8)
    _rt(img, mode="lz77", cache_bits=6)


def test_lz77_overlapping_copy():
    # constant image: one literal then copies with dist < length
    img = np.full((50, 60, 3), 123, dtype=np.uint8)
    data = webp.encode_webp(img, mode="lz77", cache_bits=4)
    assert len(data) < 64
    _rt(img, mode="lz77", cache_bits=4)


def test_lz77_with_predictor_transform(rng):
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    img = np.tile(tile, (6, 6, 1))
    _rt(img, mode="lz77", predictor=11, cache_bits=6)


def test_lz77_value_fwd_inverse_exhaustive():
    """_lz77_fwd must be the exact inverse of the decoder's
    _lz77_value over the whole usable range."""
    for v in list(range(1, 5000)) + [2 ** k for k in range(13, 20)]:
        code, nbits, extra = _lz77_fwd(v)
        w = _Writer()
        w.write(extra, nbits)
        assert _lz77_value(_Reader(w.bytes()), code) == v


# --- hand-crafted decoder-only features ------------------------------------


def _two_symbol_lengths(alphabet, s0, s1):
    lengths = [0] * alphabet
    lengths[s0] = 1
    lengths[s1] = 1
    return lengths


def _single_lengths(alphabet, s):
    lengths = [0] * alphabet
    lengths[s] = 1
    return lengths


def test_meta_prefix_groups_decode():
    """Entropy image with two prefix-code groups: left 4x4 block uses
    group 0 (greens 10/20), right block group 1 (greens 200/210); the
    encoder never emits this shape, so build the stream by hand."""
    h, w = 4, 8
    wtr = _Writer()
    _write_image_header(wtr, w, h)
    wtr.write(0, 1)  # no transforms
    wtr.write(0, 1)  # no color cache
    wtr.write(1, 1)  # meta prefix codes present
    meta_bits = 2
    wtr.write(meta_bits - 2, 3)
    # entropy image 2x1: meta index lives in (red<<8)|green
    eimg = np.array([[0x00, 0x01]], dtype=np.uint32) << 8
    eimg |= np.uint32(0xFF) << 24
    _write_literal_image(wtr, eimg, "huffman")
    # two groups; per group: green (two 1-bit symbols), r/b/a/dist single
    payload_codes = []
    for glo, ghi in ((10, 20), (200, 210)):
        payload_codes.append(
            _write_prefix_code(wtr, _two_symbol_lengths(280, glo, ghi))
        )
        for lengths in (
            _single_lengths(256, 7),    # red
            _single_lengths(256, 9),    # blue
            _single_lengths(256, 255),  # alpha
            _single_lengths(40, 0),     # distance
        ):
            _write_prefix_code(wtr, lengths)
    # payload: row-major pixels, 1 green bit each, alternating per x
    expect_green = np.zeros((h, w), dtype=np.uint32)
    for y in range(h):
        for x in range(w):
            group = x >> meta_bits
            lo, hi = ((10, 20), (200, 210))[group]
            sym = hi if (x + y) % 2 else lo
            expect_green[y, x] = sym
            code, ln = payload_codes[group][sym]
            wtr.write(webp._revbits(code, ln), ln)
    out = webp.decode_webp_rgb(_container(wtr.bytes()))
    assert np.array_equal(out[:, :, 1], expect_green)
    assert np.array_equal(out[:, :, 0], np.full((h, w), 7, np.float32))
    assert np.array_equal(out[:, :, 2], np.full((h, w), 9, np.float32))


def test_color_transform_decode(rng):
    """Color transform (type 1): residuals computed with the exact
    forward twin of _inv_color_transform must reconstruct the source
    through the decoder's inverse."""
    h, w = 16, 24
    size_bits = 3  # 8x8 blocks -> 2x3 transform image
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    px = img.astype(np.uint32)
    argb = (
        (np.uint32(255) << 24) | (px[:, :, 0] << 16)
        | (px[:, :, 1] << 8) | px[:, :, 2]
    )
    tw, th = (w + 7) >> 3, (h + 7) >> 3
    g2r = rng.integers(0, 256, (th, tw), dtype=np.uint32)
    g2b = rng.integers(0, 256, (th, tw), dtype=np.uint32)
    r2b = rng.integers(0, 256, (th, tw), dtype=np.uint32)
    tdata = (np.uint32(255) << 24) | (g2r << 16) | (g2b << 8) | r2b
    # forward: subtract the deltas the inverse adds (inverse uses the
    # RECONSTRUCTED red — i.e. the original red — in the r2b term)
    by = np.arange(h) >> size_bits
    bx = np.arange(w) >> size_bits
    blocks = tdata[np.ix_(by, bx)]
    r = ((argb >> 16) & 0xFF).astype(np.int64)
    g = ((argb >> 8) & 0xFF).astype(np.int64)
    b = (argb & 0xFF).astype(np.int64)
    res_r = (r - webp._ct_delta((blocks >> 16) & 0xFF, g)) & 0xFF
    res_b = (
        b
        - webp._ct_delta((blocks >> 8) & 0xFF, g)
        - webp._ct_delta(blocks & 0xFF, r)
    ) & 0xFF
    residual = (
        (np.uint32(255) << 24)
        | (res_r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | res_b.astype(np.uint32)
    )
    wtr = _Writer()
    _write_image_header(wtr, w, h)
    wtr.write(1, 1)
    wtr.write(1, 2)  # COLOR_TRANSFORM
    wtr.write(size_bits - 2, 3)
    _write_literal_image(wtr, tdata, "huffman")
    wtr.write(0, 1)  # end of transforms
    wtr.write(0, 1)  # no meta prefix codes
    _write_literal_image(wtr, residual, "huffman")
    out = webp.decode_webp_rgb(_container(wtr.bytes()))
    assert np.array_equal(out, img.astype(np.float32))


# --- quarantine contract ---------------------------------------------------


def test_malformed_bytes_raise_codecerror(rng):
    good = webp.encode_webp(
        rng.integers(0, 256, (20, 20, 3), dtype=np.uint8), mode="lz77",
        cache_bits=4,
    )
    cases = [
        b"",
        b"\x12\x34" * 50,
        b"RIFF\x10\x00\x00\x00WEBP",
        good[:12],
        good[:30],
        good[:-3],
    ]
    # lossy / extended variants are explicitly unsupported
    cases.append(
        b"RIFF\x20\x00\x00\x00WEBPVP8 " + b"\x00" * 24
    )
    cases.append(
        b"RIFF\x20\x00\x00\x00WEBPVP8X" + b"\x00" * 24
    )
    for data in cases:
        with pytest.raises(CodecError):
            webp.decode_webp_rgb(data)


def test_truncation_and_bitflip_fuzz(rng):
    """Every truncation point and a battery of single-byte corruptions
    must either decode to SOME image or raise CodecError — never any
    other exception (the Spark quarantine catches CodecError only)."""
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    good = webp.encode_webp(img, mode="lz77", cache_bits=4)
    for cut in range(len(good)):
        try:
            webp.decode_webp_rgb(good[:cut])
        except CodecError:
            pass
    for trial in range(200):
        pos = int(rng.integers(0, len(good)))
        val = int(rng.integers(0, 256))
        data = good[:pos] + bytes([val]) + good[pos + 1 :]
        try:
            out = webp.decode_webp_rgb(data)
            assert out.ndim == 3
        except CodecError:
            pass


def test_gray_mixdown_convention(rng):
    """decode_webp: equal channels pass through; unequal channels take
    the channel mean — the same luma convention as decode_jfif."""
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    out = webp.decode_webp(webp.encode_webp(img))
    assert np.allclose(out, img.astype(np.float32).mean(axis=2))

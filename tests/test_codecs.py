from __future__ import annotations

import numpy as np
import pytest

from mnemophonix_spark import codecs


@pytest.fixture
def img():
    rng = np.random.default_rng(1)
    return np.round(rng.uniform(0, 255, size=(37, 53)))


def test_png_roundtrip_exact(img):
    out = codecs.decode_png(codecs.encode_png(img))
    assert np.array_equal(out, img.astype(np.float32))


def test_bmp_roundtrip_exact(img):
    out = codecs.decode_bmp(codecs.encode_bmp(img))
    assert np.array_equal(out, img.astype(np.float32))


def test_fake_jpeg_lossy_psnr_above_40(img):
    for q, lo, hi in [(95, 40, 80), (90, 40, 60)]:
        out = codecs.decode_fake_jpeg(codecs.encode_fake_jpeg(img, q))
        p = codecs.psnr(img, out)
        assert lo <= p <= hi, (q, p)


def test_decode_dispatch(img):
    for fmt in ["png", "bmp", "jpeg"]:
        data = codecs.encode(img, fmt)
        out = codecs.decode(data, fmt)
        assert out.shape == img.shape


@pytest.mark.parametrize(
    "data,fmt",
    [
        (b"", "png"),
        (b"\x00" * 100, "bmp"),
        (b"garbage", "jpeg"),
        (b"BMtruncated", "bmp"),
    ],
)
def test_malformed_raises_codec_error(data, fmt):
    with pytest.raises(codecs.CodecError):
        codecs.decode(data, fmt)


def test_unknown_fmt_raises(img):
    with pytest.raises(codecs.CodecError):
        codecs.decode(codecs.encode_png(img), "tiff")


def test_fmt_bytes_mismatch_raises(img):
    with pytest.raises(codecs.CodecError):
        codecs.decode(codecs.encode_png(img), "bmp")


def test_png_decoder_handles_filters():
    """Our encoder only emits filter 0, but the decoder must handle 1-4
    (sub/up/average/paeth) for foreign PNGs."""
    import struct
    import zlib

    rng = np.random.default_rng(2)
    img = np.round(rng.uniform(0, 255, size=(8, 16))).astype(np.uint8)
    # hand-build a PNG using filter 1 (Sub) on every row
    raw = b""
    for y in range(8):
        row = img[y].astype(np.int32)
        filtered = np.zeros(16, np.uint8)
        filtered[0] = row[0]
        for x in range(1, 16):
            filtered[x] = (row[x] - row[x - 1]) & 0xFF
        raw += b"\x01" + filtered.tobytes()
    ihdr = struct.pack(">IIBBBBB", 16, 8, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png(png)
    assert np.array_equal(out, img.astype(np.float32))


def test_psnr_identical_is_inf(img):
    assert codecs.psnr(img, img) == float("inf")


def test_channel_mean_mixdown():
    """BMP decode averages channels (wav.c:364-374 analog) — grayscale
    BMPs store the value replicated so the mean is the identity."""
    img = np.full((4, 4), 100.0)
    out = codecs.decode_bmp(codecs.encode_bmp(img))
    assert (out == 100.0).all()

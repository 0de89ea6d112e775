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


def _unfilter_naive(scan: np.ndarray, w: int, h: int) -> np.ndarray:
    """Per-pixel reference implementation of PNG unfiltering (the
    pre-vectorization code path), kept as the independent oracle for
    the wavefront decoder."""
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        f = scan[y * (w + 1)]
        row = scan[y * (w + 1) + 1 : (y + 1) * (w + 1)].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w, np.int32)
        cur = np.zeros(w, dtype=np.int32)
        left = 0
        for x in range(w):
            if f == 0:
                val = row[x]
            elif f == 1:
                val = row[x] + left
            elif f == 2:
                val = row[x] + prev[x]
            elif f == 3:
                val = row[x] + ((left + prev[x]) >> 1)
            else:
                a, b2, c2 = left, prev[x], (prev[x - 1] if x > 0 else 0)
                p = a + b2 - c2
                pa, pb, pc = abs(p - a), abs(p - b2), abs(p - c2)
                pred = a if (pa <= pb and pa <= pc) else (b2 if pb <= pc else c2)
                val = row[x] + pred
            cur[x] = val & 0xFF
            left = cur[x]
        out[y] = cur.astype(np.uint8)
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_single_filter_roundtrip(ftype):
    rng = np.random.default_rng(20 + ftype)
    img = np.round(rng.uniform(0, 255, size=(23, 31))).astype(np.uint8)
    data = codecs.encode_png(img, row_filters=np.full(23, ftype))
    assert np.array_equal(codecs.decode_png(data), img.astype(np.float32))


def test_png_mixed_filters_match_naive_unfilter():
    """Adaptive per-row filter mixes (what real encoders emit) must
    decode identically to the per-pixel reference implementation."""
    import zlib

    rng = np.random.default_rng(33)
    for trial in range(5):
        h, w = int(rng.integers(2, 40)), int(rng.integers(2, 40))
        img = np.round(rng.uniform(0, 255, size=(h, w))).astype(np.uint8)
        f = rng.integers(0, 5, size=h)
        data = codecs.encode_png(img, row_filters=f)
        out = codecs.decode_png(data)
        assert np.array_equal(out, img.astype(np.float32)), (trial, f)
        # cross-check the wavefront against the naive scan directly
        # (roundtrip alone could mask a matched encoder/decoder bug)
        idat = b""
        pos = 8
        import struct
        while pos + 8 <= len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += data[pos + 8 : pos + 8 + length]
            pos += 12 + length
        scan = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
        assert np.array_equal(out.astype(np.uint8), _unfilter_naive(scan, w, h))


def test_png_filtered_gradient_images():
    """Gradients make Sub/Average/Paeth residuals small and exercise
    every predictor branch (ties included)."""
    y, x = np.mgrid[0:32, 0:48]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    for ftype in (1, 2, 3, 4):
        data = codecs.encode_png(img, row_filters=np.full(32, ftype))
        assert np.array_equal(codecs.decode_png(data), img.astype(np.float32))


def test_psnr_identical_is_inf(img):
    assert codecs.psnr(img, img) == float("inf")


def test_channel_mean_mixdown():
    """BMP decode averages channels (wav.c:364-374 analog) — grayscale
    BMPs store the value replicated so the mean is the identity."""
    img = np.full((4, 4), 100.0)
    out = codecs.decode_bmp(codecs.encode_bmp(img))
    assert (out == 100.0).all()


def test_decode_batch_matches_per_row():
    """decode_batch must equal per-row decode exactly across formats,
    filter mixes, shapes, and quarantine rows."""
    import numpy as np

    from mnemophonix_spark import codecs

    rng = np.random.default_rng(11)
    payloads, fmts = [], []
    for shape in [(64, 64), (64, 64), (128, 96), (64, 64), (128, 96)]:
        img = np.round(rng.uniform(0, 255, size=shape)).astype(np.uint8)
        f = rng.choice([3, 4], size=shape[0]).astype(np.uint8)
        payloads.append(codecs.encode_png(img, row_filters=f))
        fmts.append("png")
    img = np.round(rng.uniform(0, 255, size=(64, 64))).astype(np.uint8)
    payloads += [
        codecs.encode_png(img),                              # filter 0 tier
        codecs.encode_png(img, row_filters=np.full(64, 1, np.uint8)),
        codecs.encode_bmp(img),
        codecs.encode_fake_jpeg(img),
        b"not an image at all",                              # quarantine
    ]
    fmts += ["png", "png", "bmp", "jpeg", "png"]
    payloads.append(codecs.encode_bmp(img))
    fmts.append("tiff")                                      # unknown fmt

    batch = codecs.decode_batch(payloads, fmts)
    for data, fmt, got in zip(payloads, fmts, batch):
        try:
            want = codecs.decode(data, fmt)
        except codecs.CodecError as e:
            assert isinstance(got, codecs.CodecError)
            assert str(got) == str(e)
            continue
        assert isinstance(got, np.ndarray)
        assert got.dtype == want.dtype and np.array_equal(got, want)


def test_unfilter_batch_matches_single():
    """The batched wavefront is bit-identical to the per-image one on
    every filter mix, including the uniform-Paeth/-Average shortcuts."""
    import numpy as np

    from mnemophonix_spark import codecs

    rng = np.random.default_rng(13)
    h, w = 48, 37
    for mix in ["all4", "all3", "mixed", "mixed01234"]:
        scans, singles = [], []
        for _ in range(5):
            img = np.round(rng.uniform(0, 255, size=(h, w))).astype(np.uint8)
            if mix == "all4":
                f = np.full(h, 4, np.uint8)
            elif mix == "all3":
                f = np.full(h, 3, np.uint8)
            elif mix == "mixed":
                f = rng.choice([3, 4], size=h).astype(np.uint8)
            else:
                f = rng.choice([0, 1, 2, 3, 4], size=h).astype(np.uint8)
            data = codecs.encode_png(img, row_filters=f)
            scan, ww, hh = codecs._parse_png(data)
            assert (ww, hh) == (w, h)
            scans.append(scan)
            singles.append(codecs._unfilter(scan, w, h))
            assert np.array_equal(singles[-1], img)
        batched = codecs._unfilter_batch(np.stack(scans), w, h)
        assert np.array_equal(batched, np.stack(singles))


def test_pgm_roundtrip_and_header_grammar():
    import numpy as np

    from mnemophonix_spark import codecs

    rng = np.random.default_rng(21)
    img = np.round(rng.uniform(0, 255, size=(23, 41))).astype(np.uint8)
    # P5 and P2 both roundtrip exactly
    for binary in (True, False):
        out = codecs.decode_pgm(codecs.encode_pgm(img, binary=binary))
        assert out.dtype == np.float32 and np.array_equal(out, img.astype(np.float32))
    # dispatch + fingerprint path
    assert np.array_equal(codecs.decode(codecs.encode_pgm(img), "pgm"),
                          img.astype(np.float32))
    got = codecs.decode_batch([codecs.encode_pgm(img)], ["pgm"])[0]
    assert np.array_equal(got, img.astype(np.float32))
    # netpbm header grammar: comments + arbitrary whitespace
    weird = (b"P5 # magic then comment\n# full comment line\n  41\t23 # dims\n"
             b"255\n" + img.tobytes())
    assert np.array_equal(codecs.decode_pgm(weird), img.astype(np.float32))
    # raster byte that LOOKS like whitespace right after maxval's single
    # delimiter must be data, not skipped
    img2 = img.copy()
    img2[0, 0] = 0x20  # space byte as first raster sample
    assert codecs.decode_pgm(codecs.encode_pgm(img2))[0, 0] == 0x20


def test_pgm_strict_rejects():
    import numpy as np
    import pytest

    from mnemophonix_spark import codecs

    img = np.full((4, 4), 7, dtype=np.uint8)
    good = codecs.encode_pgm(img)
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(b"P6\n4 4\n255\n" + b"\x00" * 48)  # PPM not PGM
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(good[:-3])  # truncated raster
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(b"P5\n4 4\n65535\n" + b"\x00" * 32)  # 16-bit maxval
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(b"P5\n0 4\n255\n")  # bad geometry
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(b"P2\n2 2\n255\n1 2 3\n")  # sample count short
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(b"P2\n2 2\n255\n1 2 3 999\n")  # out of range
    with pytest.raises(codecs.CodecError):
        codecs.decode_pgm(b"P5\nx 4\n255\n")  # non-numeric dim


def test_decode_batch_parity_property():
    """Property: for ANY mix of shapes, per-row filter choices, and
    formats, decode_batch == per-row decode bitwise (hypothesis sweep)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mnemophonix_spark import codecs

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def run(data):
        rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
        n = data.draw(st.integers(1, 6))
        payloads, fmts = [], []
        for _ in range(n):
            h = data.draw(st.sampled_from([1, 2, 7, 16, 33]))
            w = data.draw(st.sampled_from([1, 3, 8, 31]))
            img = np.round(rng.uniform(0, 255, size=(h, w))).astype(np.uint8)
            fmt = data.draw(st.sampled_from(["png", "bmp", "jpeg", "pgm"]))
            if fmt == "png":
                f = rng.integers(0, 5, size=h).astype(np.uint8)
                payloads.append(codecs.encode_png(img, row_filters=f))
            else:
                payloads.append(codecs.encode(img, fmt))
            fmts.append(fmt)
        batch = codecs.decode_batch(payloads, fmts)
        for p, f, got in zip(payloads, fmts, batch):
            want = codecs.decode(p, f)
            assert isinstance(got, np.ndarray)
            assert got.dtype == want.dtype and np.array_equal(got, want)

    run()


def test_png_color_types_decode():
    """Every 8-bit PNG color type decodes with per-channel unfiltering
    and channel-mean mixdown (alpha ignored): RGB, RGBA, palette,
    gray+alpha, across filter-0 and adaptive per-row filter mixes."""
    rng = np.random.default_rng(77)
    mix = np.array([0, 1, 2, 3, 4] * 8)
    rgb = rng.integers(0, 256, (40, 30, 3))
    for filt in (None, mix):
        out = codecs.decode_png(codecs.encode_png_color(rgb, 2, row_filters=filt))
        assert np.array_equal(out, rgb.astype(np.float32).mean(axis=2))
    rgba = rng.integers(0, 256, (12, 9, 4))
    out = codecs.decode_png(codecs.encode_png_color(rgba, 6))
    assert np.array_equal(out, rgba[:, :, :3].astype(np.float32).mean(axis=2))
    pal = rng.integers(0, 256, (17, 3)).astype(np.uint8)
    idx = rng.integers(0, 17, (25, 14))
    out = codecs.decode_png(
        codecs.encode_png_color(idx, 3, palette=pal,
                                row_filters=np.array([4] * 25))
    )
    assert np.array_equal(out, pal[idx].astype(np.float32).mean(axis=2))
    ga = rng.integers(0, 256, (8, 8, 2))
    out = codecs.decode_png(codecs.encode_png_color(ga, 4))
    assert np.array_equal(out, ga[:, :, 0].astype(np.float32))


def test_png_color_batch_routing_and_quarantine():
    """decode_batch routes color PNGs per-row (the grouped wavefront
    stays grayscale) and quarantines malformed color containers."""
    rng = np.random.default_rng(78)
    g = rng.integers(0, 256, (20, 20)).astype(np.float64)
    rgb = rng.integers(0, 256, (20, 20, 3))
    bad_pal = codecs.encode_png_color(
        np.full((4, 4), 9, dtype=np.uint8), 3,
        palette=np.zeros((4, 3), dtype=np.uint8))  # index 9 > palette
    res = codecs.decode_batch(
        [codecs.encode_png(g), codecs.encode_png_color(rgb, 2), bad_pal],
        ["png"] * 3,
    )
    assert np.array_equal(res[0], np.clip(g, 0, 255).astype(np.uint8).astype(np.float32))
    assert np.array_equal(res[1], rgb.astype(np.float32).mean(axis=2))
    assert isinstance(res[2], codecs.CodecError)


def test_png_color_fuzz_quarantine():
    rng = np.random.default_rng(79)
    good = codecs.encode_png_color(rng.integers(0, 256, (16, 16, 3)), 2)
    for _ in range(150):
        data = bytearray(good)
        if rng.random() < 0.5:
            data = data[: int(rng.integers(9, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(8, len(data)))] = int(rng.integers(0, 256))
        try:
            codecs.decode_png(bytes(data))
        except codecs.CodecError:
            pass  # quarantined, never any other exception

"""From-scratch GIF codec (GIF87a/89a + LZW) — roundtrips, scalar/
vectorized LZW parity, hand-crafted streams for decoder-only features
(interlace, local color tables, extensions, color palettes), and the
quarantine contract.

Reference parity note: the reference accepts GIF through its ffmpeg
fallback (ffmpeg.c:35-65); this container has no PIL/ffmpeg, so the
codec is implemented from the public CompuServe/W3C GIF89a spec in
mnemophonix_spark/gif.py and validated here by encode/decode roundtrip
plus adversarial bitstreams.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mnemophonix_spark import codecs, gif
from mnemophonix_spark.codecs import CodecError


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(4321)


def _expect(g):
    return np.round(np.clip(np.asarray(g, dtype=np.float64), 0, 255)).astype(
        np.float32
    )


def _rt(g):
    out = gif.decode_gif(gif.encode_gif(g))
    assert out.dtype == np.float32
    assert np.array_equal(out, _expect(g))
    return out


# --- roundtrips ------------------------------------------------------------


def test_roundtrip_noise(rng):
    _rt(rng.integers(0, 256, (57, 43)).astype(np.float64))


def test_roundtrip_structured(rng):
    x = np.arange(96)[None, :] / 5.0
    y = np.arange(128)[:, None] / 7.0
    _rt(np.clip(np.sin(y) * np.cos(x) * 120 + 128 + rng.normal(0, 10, (128, 96)), 0, 255))


def test_roundtrip_flat_and_tiny():
    _rt(np.full((64, 64), 77.0))
    _rt(np.array([[0.0]]))
    _rt(np.array([[255.0, 0.0]]))


def test_roundtrip_forces_table_reset(rng):
    # >4096 LZW entries → encoder emits mid-stream clear, decoder resets
    big = rng.integers(0, 256, (333, 257)).astype(np.float64)
    data = gif.encode_gif(big)
    assert np.array_equal(gif.decode_gif(data), _expect(big))


def test_roundtrip_float_rounding(rng):
    _rt(rng.random((20, 20)) * 255.0)


# --- scalar vs vectorized LZW parity ---------------------------------------


def _raw_stream(data: bytes) -> tuple[bytes, int, int, int]:
    w, h = struct.unpack_from("<HH", data, 6)
    pos = 13 + 768 + 10  # header + GCT + image descriptor
    mcs = data[pos]
    stream, _ = gif._collect_subblocks(data, pos + 1)
    return stream, mcs, w, h


@pytest.mark.parametrize("case", ["noise", "flat", "gradient", "binary"])
def test_lzw_fast_matches_scalar(rng, case):
    g = {
        "noise": lambda: rng.integers(0, 256, (128, 128)).astype(np.float64),
        "flat": lambda: np.full((80, 80), 13.0),
        "gradient": lambda: np.tile(np.arange(256, dtype=np.float64), (40, 1)),
        "binary": lambda: (rng.random((150, 150)) > 0.5) * 255.0,
    }[case]()
    stream, mcs, w, h = _raw_stream(gif.encode_gif(g))
    slow = bytes(gif._lzw_decode(stream, mcs, w * h)[: w * h])
    fast = gif._lzw_decode_fast(stream, mcs, w * h)[: w * h]
    assert slow == fast


def test_lzw_fast_small_code_sizes():
    # hand-built streams at min code sizes the encoder never emits
    for mcs in (2, 3, 5):
        n = 1 << mcs
        pixels = bytes([i % n for i in range(500)])
        stream = gif._lzw_encode(pixels, mcs)
        slow = bytes(gif._lzw_decode(stream, mcs, 500))
        fast = gif._lzw_decode_fast(stream, mcs, 500)
        assert slow[:500] == fast[:500] == pixels


def test_lzw_extraction_bounded_by_pixel_budget(rng):
    # a multi-MB garbage stream must not balloon into unbounded code
    # arrays when the declared geometry is tiny: extraction stops at
    # the pixel budget (+1), not at the end of the stream
    garbage = rng.integers(0, 256, 2_000_000).astype(np.uint8).tobytes()
    segs = gif._extract_codes(garbage, 8, 65)
    assert sum(s.size for s in segs) <= 65
    # and the full decoder under the same budget stays small/quick
    try:
        gif._lzw_decode_fast(garbage, 8, 64)
    except CodecError:
        pass  # garbage may fail validation; it must not blow memory


def test_lzw_accepts_missing_eoi(rng):
    g = rng.integers(0, 256, (32, 32)).astype(np.float64)
    stream, mcs, w, h = _raw_stream(gif.encode_gif(g))
    # chop the trailing EOI bits; both readers accept what decodes fully
    chopped = stream[:-1]
    slow = bytes(gif._lzw_decode(chopped, mcs, w * h))
    fast = gif._lzw_decode_fast(chopped, mcs, w * h)
    assert slow == fast[: len(slow)] or fast == slow[: len(fast)]


# --- decoder-only features (hand-crafted containers) -----------------------


def _build_gif(idx_rows: np.ndarray, pal: np.ndarray, *, interlace=False,
               local_table=False, extensions=(), version=b"GIF89a") -> bytes:
    """Assemble a single-frame GIF with arbitrary palette/flags."""
    h, w = idx_rows.shape
    n = len(pal)
    bits = max(1, (n - 1).bit_length())
    size_field = bits - 1
    pal_pad = np.zeros(((1 << bits), 3), dtype=np.uint8)
    pal_pad[:n] = pal
    out = bytearray(version)
    gpacked = (0x80 | size_field) if not local_table else 0x00
    out += struct.pack("<HHBBB", w, h, gpacked, 0, 0)
    if not local_table:
        out += pal_pad.tobytes()
    for ext in extensions:
        out += ext
    ipacked = (0x40 if interlace else 0) | ((0x80 | size_field) if local_table else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_table:
        out += pal_pad.tobytes()
    mcs = max(2, bits)
    stream = idx_rows.astype(np.uint8).tobytes()
    if interlace:
        order = np.concatenate(
            [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        stream = idx_rows[order].astype(np.uint8).tobytes()
    lzw = gif._lzw_encode(stream, mcs)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        out.append(len(lzw[i : i + 255]))
        out += lzw[i : i + 255]
    out += b"\x00\x3b"
    return bytes(out)


def test_color_palette_mean_mixdown(rng):
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (21, 17))
    out = gif.decode_gif(_build_gif(idx, pal))
    want = pal[idx].astype(np.float32).mean(axis=2)
    assert np.array_equal(out, want)


def test_interlaced_frame(rng):
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    idx = rng.integers(0, 256, (37, 23))  # h not divisible by 8
    out = gif.decode_gif(_build_gif(idx, pal, interlace=True))
    assert np.array_equal(out, idx.astype(np.float32))


def test_local_color_table(rng):
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (9, 11))
    out = gif.decode_gif(_build_gif(idx, pal, local_table=True))
    assert np.array_equal(out, pal[idx].astype(np.float32).mean(axis=2))


def test_gif89a_extensions_skipped(rng):
    pal = np.repeat(np.arange(4, dtype=np.uint8) * 80, 3).reshape(4, 3)
    idx = rng.integers(0, 4, (6, 6))
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # graphic control
    comment = b"\x21\xfe\x05hello\x00"
    appext = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    out = gif.decode_gif(
        _build_gif(idx, pal, extensions=(gce, comment, appext))
    )
    assert np.array_equal(out, pal[idx].astype(np.float32).mean(axis=2))


def test_first_frame_only(rng):
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    a = rng.integers(0, 256, (8, 8))
    one = bytearray(_build_gif(a, pal))
    # splice a second frame before the trailer; decoder must return frame 1
    second = _build_gif(rng.integers(0, 256, (8, 8)), pal)
    frame2 = second[13 + 768 : -1]  # descriptor + data, no header/trailer
    two = bytes(one[:-1]) + frame2 + b"\x3b"
    assert np.array_equal(gif.decode_gif(two), a.astype(np.float32))


# --- animated GIF (video container) ----------------------------------------


def test_animated_roundtrip(rng):
    frames = rng.integers(0, 256, (6, 24, 32)).astype(np.float64)
    out = gif.decode_gif_frames(gif.encode_gif_frames(frames))
    assert out.shape == (6, 24, 32)
    assert np.array_equal(out, np.round(frames).astype(np.float32))


def test_animated_first_frame_matches_single_decode(rng):
    frames = rng.integers(0, 256, (3, 16, 16)).astype(np.float64)
    data = gif.encode_gif_frames(frames)
    assert np.array_equal(gif.decode_gif(data), np.round(frames[0]).astype(np.float32))


def test_animated_max_frames_cap(rng):
    frames = rng.integers(0, 256, (8, 8, 8)).astype(np.float64)
    out = gif.decode_gif_frames(gif.encode_gif_frames(frames), max_frames=3)
    assert out.shape[0] == 3


def _anim_shell(sw, sh, pal, blocks):
    out = bytearray(b"GIF89a")
    bits = max(1, (len(pal) - 1).bit_length())
    pad = np.zeros((1 << bits, 3), dtype=np.uint8)
    pad[: len(pal)] = pal
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), 1, 0)  # bg idx 1
    out += pad.tobytes()
    for b in blocks:
        out += b
    out += b"\x3b"
    return bytes(out)


def _frame_block(idx, left, top, *, gce=None):
    h, w = idx.shape
    out = bytearray()
    if gce is not None:
        out += b"\x21\xf9\x04" + bytes([gce[0] << 2 | (1 if gce[1] is not None else 0),
                                        0, 0, gce[1] or 0]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
    mcs = 2
    lzw = gif._lzw_encode(idx.astype(np.uint8).tobytes(), mcs)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        out.append(len(lzw[i : i + 255]))
        out += lzw[i : i + 255]
    out.append(0)
    return bytes(out)


def test_animated_composition_offsets_and_transparency():
    # palette: 0=black 1=white 2=gray; bg index 1 (white)
    pal = np.array([[0, 0, 0], [255, 255, 255], [100, 100, 100]], dtype=np.uint8)
    f1 = np.zeros((4, 4), dtype=np.uint8)            # full-screen black
    f2 = np.full((2, 2), 2, dtype=np.uint8)          # gray patch at (1,1)
    f2[0, 0] = 3                                     # transparent px (idx 3)
    pal4 = np.vstack([pal, [[9, 9, 9]]])
    data = _anim_shell(4, 4, pal4, [
        _frame_block(f1, 0, 0),
        _frame_block(f2, 1, 1, gce=(0, 3)),          # keep, transparency 3
    ])
    out = gif.decode_gif_frames(data)
    assert out.shape == (2, 4, 4)
    assert np.all(out[0] == 0.0)
    want = np.zeros((4, 4), dtype=np.float32)
    want[1:3, 1:3] = 100.0
    want[1, 1] = 0.0  # transparent keeps frame-1 black
    assert np.array_equal(out[1], want)


def test_animated_disposal_background_and_previous():
    pal = np.array([[0, 0, 0], [255, 255, 255], [100, 100, 100],
                    [200, 200, 200]], dtype=np.uint8)
    full = np.zeros((4, 4), dtype=np.uint8)
    patch = np.full((2, 2), 2, dtype=np.uint8)
    data = _anim_shell(4, 4, pal, [
        _frame_block(full, 0, 0, gce=(1, None)),   # keep
        _frame_block(patch, 0, 0, gce=(2, None)),  # restore rect to bg after
        _frame_block(patch, 2, 2, gce=(3, None)),  # restore previous after
        _frame_block(np.full((1, 1), 3, dtype=np.uint8), 0, 0),
    ])
    out = gif.decode_gif_frames(data)
    assert out.shape == (4, 4, 4)
    # frame 2: patch drawn over black
    want2 = np.zeros((4, 4), dtype=np.float32)
    want2[0:2, 0:2] = 100.0
    assert np.array_equal(out[1], want2)
    # frame 3: disposal 2 restored rect to bg WHITE, patch at (2,2)
    want3 = np.zeros((4, 4), dtype=np.float32)
    want3[0:2, 0:2] = 255.0
    want3[2:4, 2:4] = 100.0
    assert np.array_equal(out[2], want3)
    # frame 4: disposal 3 restored the pre-frame-3 canvas, then 1px draw
    want4 = np.zeros((4, 4), dtype=np.float32)
    want4[0:2, 0:2] = 255.0
    want4[0, 0] = 200.0
    assert np.array_equal(out[3], want4)


def test_animated_malformed_quarantines(rng):
    good = gif.encode_gif_frames(rng.integers(0, 256, (3, 8, 8)).astype(np.float64))
    for _ in range(100):
        data = bytearray(good)
        if rng.random() < 0.5:
            data = data[: int(rng.integers(6, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 5))):
                data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        try:
            gif.decode_gif_frames(bytes(data))
        except CodecError:
            pass


def test_animated_frame_rect_outside_screen_rejected():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    bad = _anim_shell(4, 4, pal, [
        _frame_block(np.zeros((3, 3), dtype=np.uint8), 2, 2),  # 2+3 > 4
    ])
    with pytest.raises(CodecError):
        gif.decode_gif_frames(bad)


# --- quarantine contract ---------------------------------------------------


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"XIF87a" + b[6:],                      # bad magic
        lambda b: b[:10],                                  # truncated header
        lambda b: b[: 13 + 100],                           # truncated GCT
        lambda b: b[:-40],                                 # truncated image data
        # unknown block id at the image-descriptor offset (13 + GCT)
        lambda b: b[: 13 + 768] + b"\x7c" + b[13 + 768 + 1 :],
        lambda b: b,                                       # identity (control)
    ],
)
def test_malformed_raises_codec_error(rng, mutate):
    good = gif.encode_gif(rng.integers(0, 256, (24, 24)).astype(np.float64))
    data = mutate(good)
    if data == good:
        gif.decode_gif(data)  # control decodes fine
        return
    with pytest.raises(CodecError):
        gif.decode_gif(data)


def test_no_frame_and_zero_geometry():
    with pytest.raises(CodecError):
        gif.decode_gif(b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b")
    pal = np.zeros((2, 3), dtype=np.uint8)
    bad = bytearray(_build_gif(np.zeros((4, 4), dtype=int), pal))
    # zero the frame width inside the image descriptor
    pos = bad.index(b"\x2c", 13)
    struct.pack_into("<H", bad, pos + 5, 0)
    with pytest.raises(CodecError):
        gif.decode_gif(bytes(bad))


def test_lzw_underrun_is_codec_error(rng):
    g = rng.integers(0, 256, (40, 40)).astype(np.float64)
    data = bytearray(gif.encode_gif(g))
    # declare a taller frame than the stream can fill (descriptor sits
    # at the fixed 13 + 768-byte-GCT offset in encoder output)
    pos = 13 + 768
    assert data[pos] == 0x2C
    struct.pack_into("<H", data, pos + 7, 80)
    with pytest.raises(CodecError):
        gif.decode_gif(bytes(data))


def test_fuzz_random_bytes_quarantine(rng):
    for i in range(200):
        data = rng.integers(0, 256, int(rng.integers(0, 300))).astype(np.uint8).tobytes()
        if rng.random() < 0.5:
            data = b"GIF89a" + data  # valid magic, garbage body
        try:
            gif.decode_gif(data)
        except CodecError:
            pass  # quarantined, never any other exception


def test_fuzz_truncations_and_bitflips(rng):
    good = gif.encode_gif(rng.integers(0, 256, (32, 32)).astype(np.float64))
    for _ in range(150):
        data = bytearray(good)
        if rng.random() < 0.5:
            data = data[: int(rng.integers(1, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        try:
            gif.decode_gif(bytes(data))
        except CodecError:
            pass


# --- dispatch integration --------------------------------------------------


def test_codecs_dispatch_roundtrip(rng):
    g = rng.integers(0, 256, (30, 41)).astype(np.float64)
    data = codecs.encode(g, "gif")
    out = codecs.decode(data, "gif")
    assert np.array_equal(out, _expect(g))


def test_decode_batch_mixed_with_gif(rng):
    imgs = [rng.integers(0, 256, (16, 16)).astype(np.float64) for _ in range(4)]
    payloads = [
        codecs.encode(imgs[0], "gif"),
        codecs.encode(imgs[1], "png"),
        b"GIF89agarbage",
        codecs.encode(imgs[3], "gif"),
    ]
    res = codecs.decode_batch(payloads, ["gif", "png", "gif", "gif"])
    assert np.array_equal(res[0], _expect(imgs[0]))
    assert np.array_equal(res[1], _expect(imgs[1]))
    assert isinstance(res[2], CodecError)
    assert np.array_equal(res[3], _expect(imgs[3]))


def test_gif_roundtrip_property():
    """Hypothesis: any uint8 grayscale array roundtrips exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=30, deadline=None)
    @given(arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40))))
    def prop(g):
        out = gif.decode_gif(gif.encode_gif(g.astype(np.float64)))
        assert np.array_equal(out, g.astype(np.float32))

    prop()

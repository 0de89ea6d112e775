"""Baseline TIFF codec — roundtrips, hand-built big-endian / PackBits /
RGB / multi-strip containers, and the quarantine contract.

Reference parity note: the reference accepts TIFF through its ffmpeg
fallback (ffmpeg.c:35-65); here the TIFF 6.0 grayscale subset is
implemented from the public spec in mnemophonix_spark/tiff.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mnemophonix_spark import codecs, tiff
from mnemophonix_spark.codecs import CodecError


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


def _expect(g):
    return np.round(np.clip(np.asarray(g, dtype=np.float64), 0, 255)).astype(
        np.float32
    )


def test_roundtrip(rng):
    for shape in [(1, 1), (40, 56), (128, 96)]:
        g = rng.integers(0, 256, shape).astype(np.float64)
        out = tiff.decode_tiff(tiff.encode_tiff(g))
        assert out.dtype == np.float32
        assert np.array_equal(out, _expect(g))


def _build_tiff(entries, payload, *, big_endian=False, extra=b""):
    e = ">" if big_endian else "<"
    order = b"MM" if big_endian else b"II"
    ifd_off = 8 + len(payload) + len(extra)
    out = bytearray(struct.pack(e + "2sHI", order, 42, ifd_off))
    out += payload + extra
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, val in entries:
        if typ == 3 and count == 1:
            out += struct.pack(e + "HHIHH", tag, typ, count, val, 0)
        else:
            out += struct.pack(e + "HHII", tag, typ, count, val)
    out += struct.pack(e + "I", 0)
    return bytes(out)


def _gray_entries(w, h, count, compression=1, photometric=1):
    return [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
        (259, 3, 1, compression), (262, 3, 1, photometric),
        (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, count),
    ]


def test_big_endian_decode(rng):
    g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    data = _build_tiff(_gray_entries(13, 9, g.size), g.tobytes(),
                       big_endian=True)
    assert np.array_equal(tiff.decode_tiff(data), g.astype(np.float32))


def test_min_is_white_inverts(rng):
    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    data = _build_tiff(_gray_entries(7, 5, g.size, photometric=0),
                       g.tobytes())
    assert np.array_equal(tiff.decode_tiff(data),
                          255.0 - g.astype(np.float32))


def test_packbits_strip(rng):
    row = bytes([7] * 20)  # compressible
    img = np.frombuffer(row * 6, dtype=np.uint8).reshape(6, 20)
    # encode PackBits by hand: repeat runs of 128 max
    pb = b"\x85\x07" * ((img.size + 123) // 124)  # 257-133=124-byte runs
    # simpler: exact run encoding for 120 bytes: one run of 120
    pb = bytes([257 - 120, 7]) + bytes([0]) + bytes([7])  # 120 + literal 1
    # need exactly 120 bytes: run(120)=0x89? 257-h=120 -> h=137
    pb = bytes([137, 7])
    entries = _gray_entries(20, 6, len(pb), compression=32773)
    data = _build_tiff(entries, pb)
    assert np.array_equal(tiff.decode_tiff(data), img.astype(np.float32))


def test_rgb_mean_mixdown(rng):
    rgbs = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    entries = [
        (256, 4, 1, 6), (257, 4, 1, 4), (259, 3, 1, 1), (262, 3, 1, 2),
        (273, 4, 1, 8), (277, 3, 1, 3), (278, 4, 1, 4),
        (279, 4, 1, rgbs.size),
    ]
    data = _build_tiff(entries, rgbs.tobytes())
    assert np.array_equal(tiff.decode_tiff(data),
                          rgbs.astype(np.float32).mean(axis=2))


def test_multi_strip(rng):
    g = rng.integers(0, 256, (10, 8), dtype=np.uint8)
    # two strips of 5 rows; offsets array lives out-of-line
    strip1, strip2 = g[:5].tobytes(), g[5:].tobytes()
    payload = strip1 + strip2
    # out-of-line LONG arrays for offsets/counts appended after payload
    arrays = struct.pack("<II", 8, 8 + len(strip1))
    arrays += struct.pack("<II", len(strip1), len(strip2))
    off_pos = 8 + len(payload)
    entries = [
        (256, 4, 1, 8), (257, 4, 1, 10), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 2, off_pos), (277, 3, 1, 1),
        (278, 4, 1, 5), (279, 4, 2, off_pos + 8),
    ]
    data = _build_tiff(entries, payload, extra=arrays)
    assert np.array_equal(tiff.decode_tiff(data), g.astype(np.float32))


@pytest.mark.parametrize("mutate", [
    lambda b: b"XX" + b[2:],                 # bad order mark
    lambda b: b[:6],                          # truncated header
    lambda b: b[: len(b) // 2],               # truncated IFD
    lambda b: b[:4] + struct.pack("<I", len(b) + 50) + b[8:],  # IFD oob
])
def test_malformed_raises(rng, mutate):
    good = tiff.encode_tiff(rng.integers(0, 256, (8, 8)).astype(np.float64))
    with pytest.raises(CodecError):
        tiff.decode_tiff(mutate(good))


def test_fuzz_quarantine(rng):
    good = tiff.encode_tiff(rng.integers(0, 256, (16, 16)).astype(np.float64))
    for _ in range(200):
        data = bytearray(good)
        if rng.random() < 0.5:
            data = data[: int(rng.integers(1, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        try:
            tiff.decode_tiff(bytes(data))
        except CodecError:
            pass  # never any other exception


def test_codecs_dispatch(rng):
    g = rng.integers(0, 256, (21, 34)).astype(np.float64)
    assert np.array_equal(codecs.decode(codecs.encode(g, "tiff"), "tiff"),
                          _expect(g))


def test_tiff_roundtrip_property():
    """Hypothesis: any uint8 grayscale array roundtrips exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=30, deadline=None)
    @given(arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40))))
    def prop(g):
        out = tiff.decode_tiff(tiff.encode_tiff(g.astype(np.float64)))
        assert np.array_equal(out, g.astype(np.float32))

    prop()

"""From-scratch VP8 (lossy WebP) key-frame codec — boolean-coder
roundtrips, transform-pair consistency, token-codec roundtrips,
whole-frame PSNR gates, container dispatch, and quarantine contract.

Reference parity note: the reference accepts lossy WebP through its
ffmpeg fallback (ffmpeg.c:35-65); this container has no libwebp, so
the codec follows the public RFC 6386 key-frame architecture in
mnemophonix_spark/vp8.py (documented stand-in constant tables — see
its module docstring) and is validated by encode/decode roundtrip
plus adversarial bitstreams.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mnemophonix_spark import vp8, webp
from mnemophonix_spark.codecs import CodecError
from mnemophonix_spark.vp8 import (
    ZIGZAG,
    _BoolDecoder,
    _BoolEncoder,
    _COEFF_PROBS,
    _decode_coeffs,
    _encode_coeffs,
    _FDCT,
    _FWHT,
    _idct4x4,
    _iwht4x4,
    _PLANE_Y2,
    _PLANE_Y_NO_DC,
    _quant_for,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(63086)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0 ** 2 / mse)


def _photo(rng, h, w):
    """Smooth gradient + low-frequency texture + a hard edge — the
    signal class the quality gates are calibrated on (lossy codecs are
    not gated on full-band white noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 96 + 64 * np.sin(yy / 17) + 48 * np.cos(xx / 23)
    img += 20 * np.sin((xx + yy) / 9)
    img[:, : w // 3] += 40  # hard vertical edge
    img += rng.normal(0, 2, (h, w))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


# --- boolean arithmetic coder (RFC 6386 §7) ---------------------------------


def test_bool_coder_roundtrip_random(rng):
    n = 4000
    probs = rng.integers(1, 255, n)
    bits = (rng.random(n) < probs / 256.0).astype(int)  # biased per prob
    be = _BoolEncoder()
    for b, p in zip(bits, probs):
        be.write(int(b), int(p))
    buf = be.finish()
    bd = _BoolDecoder(buf)
    got = [bd.read(int(p)) for p in probs]
    assert got == list(bits)


def test_bool_coder_literals_and_signed(rng):
    vals = rng.integers(0, 256, 200)
    svals = rng.integers(-15, 16, 200)
    be = _BoolEncoder()
    for v in vals:
        be.literal(int(v), 8)
    for v in svals:
        be.signed(int(v), 4)
    bd = _BoolDecoder(be.finish())
    assert [bd.literal(8) for _ in vals] == list(vals)
    assert [bd.signed(4) for _ in svals] == list(svals)


def test_bool_coder_carry_chain():
    # long runs of improbable bits force 0xFF carry propagation
    be = _BoolEncoder()
    pattern = [(1, 250)] * 600 + [(0, 3)] * 600 + [(1, 128)] * 64
    for b, p in pattern:
        be.write(b, p)
    bd = _BoolDecoder(be.finish())
    assert [bd.read(p) for _, p in pattern] == [b for b, _ in pattern]


def test_bool_coder_compresses_biased_stream():
    be = _BoolEncoder()
    for _ in range(8000):
        be.write(0, 250)  # highly probable bit
    assert len(be.finish()) < 8000 // 8 / 2  # far under 1 bit/bit


# --- transforms (§14.3) ------------------------------------------------------


def test_idct_matches_float_model(rng):
    coefs = rng.integers(-2048, 2048, (64, 16)).astype(np.int64)
    got = _idct4x4(coefs).reshape(64, 16)
    want = coefs.astype(np.float64) @ np.linalg.inv(_FDCT).T
    # two cascaded fixed-point 1-D passes: <= 1 LSB each
    assert np.max(np.abs(got - want)) <= 2.0


def test_iwht_matches_float_model(rng):
    coefs = rng.integers(-2048, 2048, (64, 16)).astype(np.int64)
    got = np.stack([_iwht4x4(c) for c in coefs]).reshape(64, 16)
    want = coefs.astype(np.float64) @ np.linalg.inv(_FWHT).T
    assert np.max(np.abs(got - want)) <= 2.0


def test_forward_inverse_transform_consistency(rng):
    # quantize-free loop: fdct then idct recovers the block within 1
    resid = rng.integers(-255, 256, (32, 16)).astype(np.float64)
    coefs = np.round(resid @ _FDCT.T)
    back = _idct4x4(coefs.astype(np.int64))
    assert np.max(np.abs(back.reshape(32, 16) - resid)) <= 2.0


# --- coefficient token codec (§13.2) -----------------------------------------


def test_token_codec_roundtrip_levels(rng):
    cases = []
    for _ in range(300):
        lv = np.zeros(16, np.int64)
        k = rng.integers(0, 16)
        pos = rng.choice(16, int(k), replace=False)
        lv[pos] = rng.integers(-2000, 2001, int(k))
        cases.append(lv)
    cases.append(np.zeros(16, np.int64))            # pure EOB
    cases.append(np.full(16, 2047, np.int64))       # max-category run
    for pt, first in ((_PLANE_Y2, 0), (_PLANE_Y_NO_DC, 1)):
        be = _BoolEncoder()
        nnzs = []
        for i, lv in enumerate(cases):
            z = lv.copy()
            if first == 1:
                z[0] = 0
            nnzs.append(
                _encode_coeffs(be, pt, first, i % 3, z, _COEFF_PROBS)
            )
        bd = _BoolDecoder(be.finish())
        for i, lv in enumerate(cases):
            z = lv.copy()
            if first == 1:
                z[0] = 0
            got, nnz = _decode_coeffs(bd, pt, first, i % 3, _COEFF_PROBS)
            # decode returns natural order; encode consumed zigzag order
            want = np.zeros(16, np.int64)
            want[ZIGZAG] = z
            assert np.array_equal(got, want), f"case {i} plane {pt}"
            assert nnz == nnzs[i]


# --- whole-frame roundtrip ---------------------------------------------------


def test_frame_roundtrip_psnr_gate(rng):
    img = _photo(rng, 96, 128)
    out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.float32
    assert _psnr(out, img) >= 40.0  # the north-rule lossy bound


def test_quality_monotone(rng):
    img = _photo(rng, 64, 64)
    ps = [
        _psnr(vp8.decode_vp8_frame(vp8.encode_vp8_frame(img, quality=q)), img)
        for q in (30, 60, 90, 100)
    ]
    assert ps == sorted(ps)
    assert ps[-1] >= ps[0] + 3.0  # the knob does something real


def test_non_multiple_of_16_geometry(rng):
    for h, w in ((1, 1), (15, 17), (16, 16), (33, 47), (100, 3)):
        img = _photo(rng, h, w)
        out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(img, quality=95))
        assert out.shape == (h, w)
        assert _psnr(out, img) >= 34.0  # tiny images: padding dominates


def test_constant_image_near_exact():
    img = np.full((48, 80), 137, np.uint8)
    out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(img, quality=90))
    assert np.max(np.abs(out - 137.0)) <= 2.0


def test_quant_table_monotone():
    prev = None
    for qi in range(0, 128, 8):
        q = _quant_for(qi)
        assert all(v > 0 for v in q)
        if prev is not None:
            assert all(a >= b for a, b in zip(q, prev))
        prev = q


# --- container + webp.py dispatch -------------------------------------------


def test_container_roundtrip_via_webp(rng):
    img = _photo(rng, 80, 112)
    data = vp8.encode_webp_lossy(img, quality=92)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert data[12:16] == b"VP8 "
    out = webp.decode_webp_rgb(data)
    assert out.shape == (80, 112, 3)
    # lossy luma replicated across the three channels
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    assert _psnr(out[:, :, 0], img) >= 40.0


def test_encode_webp_lossy_mode_dispatch(rng):
    img = _photo(rng, 40, 56)
    data = webp.encode_webp(img, mode="lossy", quality=90)
    out = webp.decode_webp(data)  # grayscale convenience wrapper
    assert out.shape == (40, 56)
    assert _psnr(out, img) >= 40.0


def test_encode_webp_lossy_rejects_rgb(rng):
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    with pytest.raises(CodecError):
        webp.encode_webp(img, mode="lossy")


def test_lossy_beats_lossless_size_on_photo(rng):
    img = _photo(rng, 96, 128)
    lossy = vp8.encode_webp_lossy(img, quality=80)
    lossless = webp.encode_webp(img, mode="lz77", cache_bits=8)
    assert len(lossy) < len(lossless)


# --- quarantine contract ----------------------------------------------------


def _frame_with_header(header_bits, w=16, h=16):
    """Hand-build a 'VP8 ' payload whose compressed header starts with
    the given (bit, prob) writes — for decoder feature-gate tests."""
    be = _BoolEncoder()
    for bit, prob in header_bits:
        be.write(bit, prob)
    part1 = be.finish()
    tag = (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return head + part1 + b"\x00\x00"


def test_rejects_segmentation_and_lf_delta_and_multipart():
    # color space + clamping + segmentation ON
    seg = [(0, 128), (0, 128), (1, 128)]
    with pytest.raises(CodecError, match="segmentation"):
        vp8.decode_vp8_frame(_frame_with_header(seg))
    # ... segmentation off, filter type/level/sharpness, lf-delta ON
    lfd = [(0, 128)] * 3 + [(0, 128)] * 10 + [(1, 128)]
    with pytest.raises(CodecError, match="lf-delta"):
        vp8.decode_vp8_frame(_frame_with_header(lfd))
    # lf-delta off, two-bit partition count = 1 (2 partitions)
    mp = [(0, 128)] * 3 + [(0, 128)] * 10 + [(0, 128), (0, 128), (1, 128)]
    with pytest.raises(CodecError, match="multi-partition"):
        vp8.decode_vp8_frame(_frame_with_header(mp))


def test_rejects_interframe_and_bad_startcode_and_truncation(rng):
    good = vp8.encode_vp8_frame(_photo(rng, 32, 32))
    inter = bytes([good[0] | 1]) + good[1:]
    with pytest.raises(CodecError, match="inter frame"):
        vp8.decode_vp8_frame(inter)
    bad_sc = good[:3] + b"\x00\x01\x2a" + good[6:]
    with pytest.raises(CodecError, match="start code"):
        vp8.decode_vp8_frame(bad_sc)
    with pytest.raises(CodecError):
        vp8.decode_vp8_frame(good[:8])
    # first-partition size overrunning the buffer
    tag = good[0] | (good[1] << 8) | (good[2] << 16)
    huge = ((len(good) + 99) << 5) | (tag & 0x1F)
    overrun = bytes(
        [huge & 0xFF, (huge >> 8) & 0xFF, (huge >> 16) & 0xFF]
    ) + good[3:]
    with pytest.raises(CodecError, match="overruns"):
        vp8.decode_vp8_frame(overrun)


def test_bitflip_fuzz_never_escapes_quarantine(rng):
    good = vp8.encode_webp_lossy(_photo(rng, 48, 48), quality=85)
    for _ in range(60):
        buf = bytearray(good)
        i = int(rng.integers(12, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = webp.decode_webp_rgb(bytes(buf))
            assert out.dtype == np.float32 and out.ndim == 3
            assert np.all(out >= 0) and np.all(out <= 255)
        except CodecError:
            pass  # quarantine: the only acceptable exception


def test_truncation_fuzz(rng):
    good = vp8.encode_webp_lossy(_photo(rng, 48, 48), quality=85)
    for cut in range(4, len(good), max(1, len(good) // 40)):
        try:
            out = webp.decode_webp_rgb(good[:cut])
            assert out.ndim == 3
        except CodecError:
            pass


# --- lane-pool lockstep token decoder (vp8_lockstep.py) ----------------------


def _pool_lanes(frames):
    lanes, scalars = [], []
    for f in frames:
        w, h, mr, mc, qi, probs, skips, ym, tb = vp8._parse_frame_header(f)
        lanes.append((tb, probs, skips))
        scalars.append(vp8._decode_tokens_scalar(tb, probs, skips, mr, mc))
    return lanes, scalars


def test_lockstep_pool_matches_scalar(rng):
    from mnemophonix_spark.vp8_lockstep import decode_token_pool

    frames = []
    for k in range(14):
        h, w = int(rng.integers(1, 100)), int(rng.integers(1, 120))
        img = _photo(rng, h, w)
        q = int(rng.integers(40, 101))
        frames.append(vp8.encode_vp8_frame(img, q, use_skip=bool(k % 2)))
    # flat frames: heavy skip runs, incl. an ALL-skip frame
    frames.append(vp8.encode_vp8_frame(np.full((64, 48), 77.0), 90))
    lanes, scalars = _pool_lanes(frames)
    pooled = decode_token_pool(lanes)
    for k, (a, b) in enumerate(zip(pooled, scalars)):
        assert np.array_equal(a, b), f"lane {k} diverged"


def test_lockstep_pool_random_streams_match_scalar(rng):
    """Garbage token partitions (random bytes) must produce the SAME
    garbage levels in both paths — the pool inherits the scalar
    zero-fill-past-the-end semantics, so truncated/corrupt streams
    cannot diverge between the engine tier and the oracle tier."""
    from mnemophonix_spark.vp8_lockstep import decode_token_pool

    lanes, scalars = [], []
    for k in range(12):
        mr, mc = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        tb = bytes(rng.integers(0, 256, int(rng.integers(2, 60)),
                                dtype=np.uint8))
        probs = rng.integers(1, 254, (4, 8, 3, 11)).astype(np.int64)
        skips = (rng.random((mr, mc)) < 0.3).astype(np.int64)
        lanes.append((tb, probs, skips))
        scalars.append(vp8._decode_tokens_scalar(tb, probs, skips, mr, mc))
    pooled = decode_token_pool(lanes)
    for k, (a, b) in enumerate(zip(pooled, scalars)):
        assert np.array_equal(a, b), f"random lane {k} diverged"


def test_batched_frames_match_per_image(rng):
    imgs = [_photo(rng, int(rng.integers(16, 80)),
                   int(rng.integers(16, 96))) for _ in range(9)]
    frames = [vp8.encode_vp8_frame(im, 88) for im in imgs]
    singles = [vp8.decode_vp8_frame(f) for f in frames]
    batched = vp8.decode_vp8_frames(frames)
    for a, b in zip(batched, singles):
        assert np.array_equal(a, b)


def test_wide_pool_routes_through_lockstep(rng, monkeypatch):
    """Above vp8.MIN_POOL the batch path must take the lockstep tier
    and still match per-image decode exactly."""
    monkeypatch.setattr(vp8, "MIN_POOL", 6)
    frames = [vp8.encode_vp8_frame(_photo(rng, 33, 49), 92)
              for _ in range(8)]
    singles = [vp8.decode_vp8_frame(f) for f in frames]
    batched = vp8.decode_vp8_frames(frames)
    for a, b in zip(batched, singles):
        assert np.array_equal(a, b)


def test_decode_batch_mixed_lossy_lossless_quarantine(rng):
    from mnemophonix_spark import codecs

    datas, refs = [], []
    for k in range(12):
        img = _photo(rng, 40 + k, 52 + k)
        if k % 2:
            datas.append(vp8.encode_webp_lossy(img, 92))
        else:
            datas.append(webp.encode_webp(np.round(img).astype(np.uint8)))
        refs.append(webp.decode_webp(datas[-1]))
    outs = codecs.decode_batch(datas, ["webp"] * len(datas))
    assert all(np.array_equal(a, b) for a, b in zip(outs, refs))
    datas[5] = datas[5][:30]  # truncate one lossy row
    outs = codecs.decode_batch(datas, ["webp"] * len(datas))
    assert isinstance(outs[5], codecs.CodecError)
    assert all(np.array_equal(o, refs[j]) for j, o in enumerate(outs)
               if j != 5)


def test_geometry_memory_bound():
    """Crafted-header blow-up guard (round-4 GIF-advisory class): a
    few-byte frame claiming huge 14-bit dimensions must quarantine,
    not allocate multi-GB level/canvas arrays."""
    be = _BoolEncoder()
    be.write(0, 128)
    part1 = be.finish()
    tag = (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a" + struct.pack("<HH", 16383, 16383)
    with pytest.raises(CodecError, match="geometry"):
        vp8.decode_vp8_frame(head + part1 + b"\x00\x00")


def test_pool_chunking_budget(rng, monkeypatch):
    """Pools above _MAX_POOL_MBS split into chunks; results must stay
    identical to the unchunked path."""
    monkeypatch.setattr(vp8, "MIN_POOL", 4)
    frames = [vp8.encode_vp8_frame(_photo(rng, 33, 49), 92)
              for _ in range(10)]
    want = [vp8.decode_vp8_frame(f) for f in frames]
    monkeypatch.setattr(vp8, "_MAX_POOL_MBS", 20)  # ~2 frames per pool
    got = vp8.decode_vp8_frames(frames)
    assert all(np.array_equal(a, b) for a, b in zip(got, want))


def test_size_class_routing_mixed_batch(rng, monkeypatch):
    """Mixed-size batches pool by SIZE CLASS (a new class opens when a
    lane is 2x the class minimum; classes narrower than MIN_POOL fall
    back to the scalar token path).  The routing sorts lanes by stream
    length and reassembles results by original index — this pins the
    bookkeeping: every frame must come back in ORDER and bit-identical
    to per-image decode, across a batch engineered to hit both the
    pooled and the scalar branch in one call."""
    monkeypatch.setattr(vp8, "MIN_POOL", 3)
    # small frames form a wide class (pooled); the two big frames make
    # a class of width 2 < MIN_POOL (scalar fallback)
    imgs = [_photo(rng, 17, 21) for _ in range(6)]
    imgs += [_photo(rng, 160, 176), _photo(rng, 176, 160)]
    order = rng.permutation(len(imgs))  # interleave sizes on input
    imgs = [imgs[j] for j in order]
    frames = [vp8.encode_vp8_frame(im, 90) for im in imgs]
    lens = sorted(len(f) for f in frames)
    assert lens[-1] > 2 * lens[0], "batch must span >= two size classes"
    want = [vp8.decode_vp8_frame(f) for f in frames]
    got = vp8.decode_vp8_frames(frames)
    assert [g.shape for g in got] == [w.shape for w in want]
    assert all(np.array_equal(a, b) for a, b in zip(got, want))


def test_vp8_roundtrip_property():
    """Hypothesis: any uint8 grayscale array survives encode/decode
    with the decoded output in-range, shape-exact, and (at q=100,
    minimal quantizer) within a tight error bound; and the lockstep
    pool equals the scalar token path on every generated frame."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from mnemophonix_spark.vp8_lockstep import decode_token_pool

    @settings(max_examples=25, deadline=None)
    @given(arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40))),
           st.integers(40, 100), st.booleans())
    def prop(g, q, use_skip):
        data = vp8.encode_vp8_frame(g.astype(np.float64), q,
                                    use_skip=use_skip)
        out = vp8.decode_vp8_frame(data)
        assert out.shape == g.shape and out.dtype == np.float32
        assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
        if q == 100:
            # quantizer floor: DC step 4, AC step 4 — max per-pixel
            # error is bounded by the transform spread of half-steps
            assert np.max(np.abs(out - g)) <= 16.0
        _w, _h, mr, mc, qi, probs, skips, _ym, tb = \
            vp8._parse_frame_header(data)
        scal = vp8._decode_tokens_scalar(tb, probs, skips, mr, mc)
        pool = decode_token_pool([(tb, probs, skips)])[0]
        assert np.array_equal(pool, scal)

    prop()

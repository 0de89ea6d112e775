"""Audio spectral front-end: naive-loop cross-checks of every DSP
kernel (independence from the vectorized implementations), strict WAV
codec behavior, and the Spark operator end-to-end vs the single-process
chain.

Reference semantics under test: resample.c:27-62 (31-tap low-pass +
decimate /8), hannwindow.c:5-13, fft.c:14-86 via rfft equivalence,
logbins.c:20-76, spectralimages.c:37-49 framing/grouping arithmetic,
wav.c:88-299 strict parse + wav.c:358-374 mixdown.
"""

from __future__ import annotations

import numpy as np
import pytest

from mnemophonix_spark import codecs
from mnemophonix_spark.functions import audio


# --------------------------------------------------------------------------
# DSP kernels vs naive loops
# --------------------------------------------------------------------------

def test_low_pass_filter_matches_c_formula():
    taps = audio.low_pass_filter()
    assert taps.shape == (31,) and taps.dtype == np.float32
    for x in range(-15, 16):
        if x == 0:
            expected = 0.125
        else:
            sinc = np.sin(np.pi * x * 0.125) / (np.pi * x * 0.125)
            blackman = (
                0.42
                - 0.5 * np.cos(2 * np.pi * (x - 15) / 30)
                + 0.08 * np.cos(4 * np.pi * (x - 15) / 30)
            )
            expected = 0.125 * sinc * blackman
        assert abs(float(taps[x + 15]) - expected) < 1e-7, x
    # window zeroes at the edges, peak at center
    assert abs(float(taps[0])) < 1e-9 and abs(float(taps[30])) < 1e-9


def test_resample_matches_naive_loop():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=1000).astype(np.float32)
    got = audio.resample_5512(x)
    taps = audio.low_pass_filter().astype(np.float64)
    n_out = x.size // 8
    assert got.shape == (n_out,)
    for i in range(n_out):  # get_5512Hz_sample: taps run FORWARD from i*8
        acc = 0.0
        for j in range(31):
            if i * 8 + j < x.size:
                acc += float(x[i * 8 + j]) * taps[j]
        assert abs(float(got[i]) - acc) < 1e-6, i


def test_hann_window_matches_naive():
    w = audio.hann_window()
    assert w.shape == (2048,) and w.dtype == np.float32
    for i in (0, 1, 512, 1023, 1024, 2047):
        expected = 0.5 * (1 - np.cos(2 * np.pi * i / 2047))
        assert abs(float(w[i]) - expected) < 1e-6
    assert w[0] == 0.0 and w[2047] < 1e-6


def test_bin_indexes_match_logbins_c():
    idx = audio.bin_indexes()
    assert idx.shape == (33,)
    log_min, log_max = np.log2(318.0), np.log2(2000.0)
    delta = (log_max - log_min) / 32
    for i in range(33):
        f = 2.0 ** (log_min + i * delta)
        expected = int(round(1024.0 * f / 2756.0))
        expected = min(max(expected, 1), 1024)
        assert idx[i] == expected, i
    assert (np.diff(idx) > 0).all()  # no degenerate bins


def test_frame_log_bins_matches_naive_per_frame():
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=2048 + 3 * 64).astype(np.float32)
    got = audio.frame_log_bins(x)
    assert got.shape == (4, 32) and got.dtype == np.float32
    w = audio.hann_window().astype(np.float64)
    idx = audio.bin_indexes()
    for fi in range(4):
        frame = x[fi * 64 : fi * 64 + 2048].astype(np.float64) * w
        spec = np.fft.fft(frame)  # full FFT: rfft equivalence under test
        for b in range(32):
            lo, hi = int(idx[b]), int(idx[b + 1])
            acc = 0.0
            for j in range(lo, hi):
                acc += (spec[j].real / 1024.0) ** 2 + (spec[j].imag / 1024.0) ** 2
            assert abs(float(got[fi, b]) - acc / (hi - lo)) < 1e-9, (fi, b)


def test_framing_arithmetic_matches_reference():
    # get_n_frames / get_n_images (spectralimages.c:37-49)
    n_samples = 20000
    x = np.zeros(n_samples, dtype=np.float32)
    bins = audio.frame_log_bins(x)
    assert bins.shape[0] == 1 + (n_samples - 2048) // 64
    many = np.zeros((300, 32), dtype=np.float32)
    imgs = audio.spectral_images(many)
    assert imgs.shape == (1 + (300 - 128) // 8, 128, 32)


def test_too_short_raises():
    with pytest.raises(audio.AudioTooShort):
        audio.frame_log_bins(np.zeros(2047, dtype=np.float32))
    with pytest.raises(audio.AudioTooShort):
        audio.spectral_images(np.zeros((127, 32), dtype=np.float32))
    with pytest.raises(audio.AudioTooShort):
        audio.pcm_to_signatures(np.zeros(5000, dtype=np.float32), rate=48000)


# --------------------------------------------------------------------------
# WAV codec (wav.c:88-299) + mixdown (wav.c:358-374)
# --------------------------------------------------------------------------

def test_wav_roundtrip_with_metadata():
    rng = np.random.default_rng(5)
    s = rng.integers(-30000, 30000, size=(500, 2)).astype(np.int16)
    data = codecs.encode_wav(s, artist="A", title="T", album="P")
    out, meta = codecs.decode_wav(data)
    assert np.array_equal(out, s)
    assert meta == {"artist": "A", "title": "T", "album": "P"}


def test_wav_no_metadata():
    s = np.zeros((100, 1), dtype=np.int16)
    out, meta = codecs.decode_wav(codecs.encode_wav(s))
    assert out.shape == (100, 1)
    assert meta == {"artist": None, "title": None, "album": None}


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"JUNK" + d[4:],                  # bad RIFF magic
        lambda d: d[:8] + b"XXXX" + d[12:],         # bad WAVE magic
        lambda d: d[:30],                           # truncated fmt
        lambda d: d[:20] + b"\x03\x00" + d[22:],    # float PCM tag
        lambda d: d[:24] + b"\x22\x56\x00\x00" + d[28:],  # 22050 Hz
        lambda d: d[:34] + b"\x08\x00" + d[36:],    # 8-bit
    ],
)
def test_wav_strict_rejections(mutate):
    s = np.zeros((100, 1), dtype=np.int16)
    data = codecs.encode_wav(s)
    with pytest.raises(codecs.CodecError):
        codecs.decode_wav(mutate(data))


def test_wav_skips_unknown_chunks():
    s = np.arange(100, dtype=np.int16)[:, None]
    data = codecs.encode_wav(s)
    # splice an unknown chunk between fmt and data (wav.c:158-178)
    head, tail = data[:36], data[36:]
    import struct as _s

    spliced = head + b"junk" + _s.pack("<I", 6) + b"abcdef" + tail
    out, _ = codecs.decode_wav(spliced)
    assert np.array_equal(out, s)


def test_mixdown_matches_reference_formula():
    s = np.array([[1000, 2000], [-32767, 32767], [5, -4]], dtype=np.int16)
    got = codecs.mixdown(s)
    for i in range(3):
        expected = np.float32(
            np.float32(int(s[i, 0]) + int(s[i, 1])) / np.float32(2.0)
        ) / np.float32(32767.0)
        assert got[i] == expected
    # stereo (s+d, s-d) averages back to s exactly
    base = np.array([100, -250, 7], dtype=np.int16)
    d = np.array([7, -13, 2], dtype=np.int32)
    stereo = np.stack(
        [base.astype(np.int32) + d, base.astype(np.int32) - d], axis=1
    ).astype(np.int16)
    assert np.array_equal(codecs.mixdown(stereo), codecs.mixdown(base[:, None]))


# --------------------------------------------------------------------------
# Spark operator end-to-end
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def audio_rows():
    from mnemophonix_spark.operators import multimodal as mm

    return mm.synthesize_audio()


def test_audio_entry_signatures_spark_matches_chain(spark, audio_rows):
    from mnemophonix_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(m, bytearray(b)) for m, b in audio_rows],
        "media_id string, bytes binary",
    )
    got = {
        (r["media_id"], r["frame_idx"]): (
            bytes(r["minhash"]) if r["minhash"] is not None else None,
            r["is_silence"], r["decode_error"],
        )
        for r in mm.audio_entry_signatures(media).collect()
    }
    n_err = sum(1 for v in got.values() if v[2] is not None)
    assert n_err == 4  # truncated, 22.05 kHz, too-short, foreign payload
    # single-process chain must agree row-for-row
    for mid, data in audio_rows:
        try:
            samples, _ = mm._decode_audio_payload(data)
            sig = audio.audio_signatures(samples)
        except Exception:
            assert got[(mid, -1)][2] is not None
            continue
        for k in range(sig["minhash"].shape[0]):
            mh, sil, err = got[(mid, k)]
            assert err is None
            assert mh == sig["minhash"][k].tobytes()
            assert sil == bool(sig["is_silence"][k])


def test_audio_planted_clones_match(spark, audio_rows):
    from mnemophonix_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(m, bytearray(b)) for m, b in audio_rows],
        "media_id string, bytes binary",
    )
    sigs = mm.audio_entry_signatures(media)
    decisions = {
        (r["media_a"], r["media_b"]): r["accepted"]
        for r in mm.entry_match_decisions(sigs).collect()
    }
    # 8 images per entry, all matching -> n_matches=8 >= 5 with avg 100
    for pair in [("audio00000", "audio00000st"), ("audio00001", "audio00001fp")]:
        assert decisions.get(pair) is True, (pair, decisions)


def test_audio_sample_digest_metadata(spark, audio_rows):
    from mnemophonix_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(m, bytearray(b)) for m, b in audio_rows],
        "media_id string, bytes binary",
    )
    rows = {r["media_id"]: r for r in mm.audio_sample_digest(media).collect()}
    r0 = rows["audio00000"]
    assert (r0["artist"], r0["title"], r0["album"]) == ("artist0", "track0", "album0")
    # stereo clone: same samples digest, no metadata
    st = rows["audio00000st"]
    assert st["samples_md5"] == r0["samples_md5"]
    assert st["artist"] is None
    # too-short entry decodes (has digest) even though it can't sign
    assert rows["audio00022"]["decode_error"] is None
    assert rows["audio00022"]["n_samples"] < 2048

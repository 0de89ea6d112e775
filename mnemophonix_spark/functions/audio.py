"""Audio spectral front-end: the reference's native domain, vectorized.

Closes the last two unimplemented reference operators (SURVEY.md §2.8,
§2.9): Hann window + FFT (hannwindow.c:5-13, fft.c:14-86) and
logarithmic frequency binning (logbins.c:44-76), plus the 31-tap
windowed-sinc resampler (resample.c:27-62) they feed on.  The image
graft replaced these with a pixel grid; this module makes the AUDIO
modality real, so FPCM/WAV payloads run the genuine chain:

  samples 44.1 kHz -> 31-tap low-pass + decimate /8 -> 5512 Hz
  -> RMS normalize (audionormalizer.c:5-32, shared kernel)
  -> frames of 2048 every 64 (spectralimages.h:12-19)
  -> x Hann -> FFT -> 32 log bins 318..2000 Hz
  -> spectral images 128 frames wide every 8 (spectralimages.h:24-30)
  -> max-norm log scale -> Haar -> top-200 bits -> MinHash
     (shared kernels from functions.kernels, unchanged)

Numerics: the C chain runs float32 with float32 cosf/sinf twiddles; we
run the FFT/bin math in float64 (np.fft.rfft) and emit float32, which
is deterministic and numerically tighter but not bit-identical to the
C binary.  Parity inside this repo is exact: the single-process oracle
fixture drives these same kernels one entry at a time, and
tests cross-check each stage against naive loop reimplementations.

Everything here is per-entry NumPy executed inside Arrow batches on
executors — one variable-length sample array in, [n_images, ...] chain
outputs out; zero per-sample Python.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from mnemophonix_spark import config as C
from mnemophonix_spark.functions import kernels

# resample.c:7  FILTER_SIZE
FILTER_SIZE = 31
# resample.c decimation factor (44100 -> 5512.5 Hz nominal)
DECIMATE = 8
SAMPLE_RATE = 44100
TARGET_RATE = SAMPLE_RATE // DECIMATE  # 5512
# spectralimages.h:12,19
SAMPLES_PER_FRAME = 2048
INTERVAL_BETWEEN_FRAMES = 64
# spectralimages.h:24,30 == config GRID_W and image stride
SPECTRAL_IMAGE_WIDTH = C.GRID_W  # 128
IMAGE_STRIDE = 8
# logbins.c:6-7
MIN_FREQUENCY = 318.0
MAX_FREQUENCY = 2000.0


class AudioTooShort(ValueError):
    """FILE_TOO_SMALL analog (fingerprinting.c:42-45): not enough
    samples for one frame / not enough frames for one image."""


# --------------------------------------------------------------------------
# 31-tap low-pass + decimate (resample.c:27-62)
# --------------------------------------------------------------------------

@lru_cache(maxsize=1)
def low_pass_filter() -> np.ndarray:
    """float32[31] taps: 0.125*sinc(0.125x)*blackman(x), x in -15..15,
    center tap 0.125 (resample.c:27-35)."""
    x = np.arange(-15, 16, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        s = np.sin(np.pi * x * 0.125) / (np.pi * x * 0.125)
    s[15] = 1.0  # sinc(0) limit; C special-cases the center tap
    # blackman_window (resample.c:17-19): 0.42 - 0.5*cos(2pi(x-15)/30)
    # + 0.08*cos(4pi(x-15)/30) on centered x; cos(t - pi) = -cos(t) and
    # cos(t - 2pi) = cos(t) flip the middle term's sign.  Peak 1.0 at
    # x=0, zeros at x=+-15.
    blackman = 0.42 + 0.5 * np.cos(2 * np.pi * x / 30) + 0.08 * np.cos(4 * np.pi * x / 30)
    taps = 0.125 * s * blackman
    taps[15] = 0.125
    return taps.astype(np.float32)


def resample_5512(samples_44100: np.ndarray) -> np.ndarray:
    """float32[n] 44.1 kHz -> float32[n//8] at 5512 Hz.

    out[i] = sum_{j<31} in[i*8+j] * taps[j], taps running FORWARD from
    the decimation point exactly like get_5512Hz_sample
    (resample.c:38-44, not centered); samples past the end contribute
    zero (the C loop's bounds check).  Vectorized as a strided-window
    matvec — one BLAS call per entry, no per-sample Python.
    """
    x = np.asarray(samples_44100, dtype=np.float32)
    n_out = x.size // DECIMATE
    if n_out == 0:
        return np.zeros(0, dtype=np.float32)
    padded = np.concatenate([x, np.zeros(FILTER_SIZE, dtype=np.float32)])
    windows = sliding_window_view(padded, FILTER_SIZE)[:: DECIMATE][:n_out]
    return (windows.astype(np.float64) @ low_pass_filter().astype(np.float64)).astype(
        np.float32
    )


def normalize_samples(samples_5512: np.ndarray) -> np.ndarray:
    """RMS normalize one sample array (audionormalizer.c:5-32), via the
    shared batched kernel on a [1, n] view."""
    if samples_5512.size == 0:
        return samples_5512.astype(np.float32)
    return kernels.rms_normalize(samples_5512[None, :].astype(np.float32))[0]


# --------------------------------------------------------------------------
# Hann window (hannwindow.c:5-13)
# --------------------------------------------------------------------------

@lru_cache(maxsize=1)
def hann_window() -> np.ndarray:
    """float32[2048]: 0.5*(1-cos(2*pi*i/(N-1)))."""
    i = np.arange(SAMPLES_PER_FRAME, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / (SAMPLES_PER_FRAME - 1)))).astype(
        np.float32
    )


# --------------------------------------------------------------------------
# log-frequency bins (logbins.c:20-76)
# --------------------------------------------------------------------------

@lru_cache(maxsize=1)
def bin_indexes() -> np.ndarray:
    """int[33] FFT-index edges of the 32 log-spaced bins over
    318..2000 Hz (logbins.c:44-55): index = round(1024*f/2756),
    clamped to [1, 1024]."""
    log_min = np.log2(MIN_FREQUENCY)
    log_max = np.log2(MAX_FREQUENCY)
    edges_hz = np.exp2(
        log_min + (log_max - log_min) * np.arange(C.GRID_H + 1) / C.GRID_H
    )
    idx = np.rint(1024.0 * edges_hz / 2756.0).astype(np.int64)
    return np.clip(idx, 1, 1024)


def frame_log_bins(samples_5512: np.ndarray) -> np.ndarray:
    """Normalized 5512 Hz samples -> float32[n_frames, 32] bin energies.

    Frames of 2048 samples every 64 (spectralimages.c:37-39), Hann
    taper (spectralimages.c:93-98), FFT magnitude (fft.c semantics via
    rfft — identical X[j] for j <= 1024 by conjugate symmetry), then
    per-bin mean of (re/1024)^2 + (im/1024)^2 over the index range
    (logbins.c:58-76).  Vectorized over all frames at once: one
    batched rfft + one reduceat.
    """
    x = np.asarray(samples_5512, dtype=np.float32)
    if x.size < SAMPLES_PER_FRAME:
        raise AudioTooShort(
            f"{x.size} samples < one frame of {SAMPLES_PER_FRAME}"
        )
    frames = sliding_window_view(x, SAMPLES_PER_FRAME)[::INTERVAL_BETWEEN_FRAMES]
    tapered = frames.astype(np.float64) * hann_window().astype(np.float64)
    spectrum = np.fft.rfft(tapered, axis=1)  # [n_frames, 1025]
    power = (spectrum.real / 1024.0) ** 2 + (spectrum.imag / 1024.0) ** 2
    edges = bin_indexes()
    sums = np.add.reduceat(power, edges[:-1], axis=1)
    # reduceat(edges[i]) sums to the NEXT start, which is edges[i+1]
    # except for the final bin (sums to array end): fix it explicitly
    widths = np.diff(edges)
    last_lo, last_hi = edges[-2], edges[-1]
    sums[:, -1] = power[:, last_lo:last_hi].sum(axis=1)
    return (sums / widths).astype(np.float32)


# --------------------------------------------------------------------------
# spectral images (spectralimages.c:116-123) + full signature chain
# --------------------------------------------------------------------------

def spectral_images(bins: np.ndarray) -> np.ndarray:
    """[n_frames, 32] bins -> [n_images, 128, 32] frame-major images,
    one every 8 frames (spectralimages.c:42-49,116-123), max-norm
    log-scaled per image (scale_to_full_spectrum)."""
    n_frames = bins.shape[0]
    if n_frames < SPECTRAL_IMAGE_WIDTH:
        raise AudioTooShort(
            f"{n_frames} frames < one spectral image of {SPECTRAL_IMAGE_WIDTH}"
        )
    # window over the frame axis: [n_images, 32, 128] -> frame-major
    imgs = sliding_window_view(bins, SPECTRAL_IMAGE_WIDTH, axis=0)[::IMAGE_STRIDE]
    imgs = np.ascontiguousarray(np.swapaxes(imgs, 1, 2))  # [n, 128, 32]
    return kernels.scale_to_full_spectrum(imgs)


def audio_signatures(samples_5512_normalized: np.ndarray) -> dict[str, np.ndarray]:
    """Normalized 5512 Hz samples -> chain outputs, one row per
    spectral image (the reference's multi-signature entries,
    fingerprinting.c:81-109): raw_fp u8[n,1024], minhash u8[n,100],
    is_silence bool[n], degenerate bool[n].

    NOTE: no RMS-normalize here — the reference normalizes SAMPLES
    (wav.c:338), not spectral images, so this deliberately skips the
    image graft's rms step and enters the shared chain at the
    max-norm log scale.
    """
    images = spectral_images(frame_log_bins(samples_5512_normalized))
    coeffs = kernels.haar2d(images)
    raw_fp, is_silence = kernels.topk_sign_bits(
        coeffs.reshape(images.shape[0], -1)
    )
    mh, degenerate = kernels.minhash100(raw_fp)
    return {
        "raw_fp": raw_fp,
        "minhash": mh,
        "is_silence": is_silence,
        "degenerate": degenerate,
    }


def pcm_to_signatures(samples: np.ndarray, rate: int) -> dict[str, np.ndarray]:
    """Mono float samples at 44100 or 5512 Hz -> signature chain.

    44100 Hz input runs the full resample (read_samples, wav.c:345-394);
    5512 Hz input is taken as already-decimated (the
    generate_fingerprint_from_samples entry point, fingerprinting.c:81)
    but still normalized here, since our FPCM payloads carry raw
    unnormalized samples.
    """
    if rate == SAMPLE_RATE:
        s = resample_5512(samples)
    elif rate == TARGET_RATE:
        s = np.asarray(samples, dtype=np.float32)
    else:
        raise AudioTooShort(f"unsupported sample rate {rate}")
    return audio_signatures(normalize_samples(s))

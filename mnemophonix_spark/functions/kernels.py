"""Vectorized NumPy kernels for the fingerprint chain.

These are the batch bodies executed inside ``mapInArrow`` /
``pandas_udf`` on executors — pure NumPy over ``[batch, ...]`` arrays,
zero per-row Python in the hot loops (BASELINE.json input_hint).  The
single-process oracle (``mnemophonix_spark.oracle``) drives the same
functions one image at a time, and ``tests/test_kernels.py`` cross-checks
them against independent naive reimplementations.

Stage-by-stage reference citations (gurushida/mnemophonix):
  - area-resize to the 128x32 grid      ~ resample.c:27-62 (low-pass+decimate)
  - RMS normalize w/ clamp              = audionormalizer.c:5-32
  - max-norm log scale                  = spectralimages.c:52-77
  - 2-D Haar (float32)                  = haar.c:23-73
  - top-200 sign binarization           = rawfingerprints.c:43-100
  - 100-permutation MinHash             = minhash.c:13-54
  - 25-band x 4-byte big-endian hashes  = lsh.c:49-52
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from mnemophonix_spark import config as C

_SQRT2 = np.float64(np.sqrt(2.0))  # haar.c uses M_SQRT2 (double) on float data


@lru_cache(maxsize=1)
def load_permutations() -> np.ndarray:
    """Frozen permutation table uint16[100,255] (permutations.c:7-1809).

    Loaded through importlib.resources, NOT a __file__-relative path:
    under ``spark-submit --py-files pkg.zip`` executors import the
    package from inside the zip, where a filesystem path does not
    exist but the zipimport loader's resource reader does.
    """
    import io
    from importlib import resources

    data = (
        resources.files("mnemophonix_spark")
        .joinpath("data/permutations.npy")
        .read_bytes()
    )
    table = np.load(io.BytesIO(data))
    assert table.shape == (C.N_PERMUTATIONS, C.PERMUTATION_LENGTH)
    return table


# --------------------------------------------------------------------------
# resize: exact area-average (box filter) to the canonical grid
# --------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """Dense [n_out, n_in] matrix of exact fractional-overlap box weights.

    Analog of the reference's windowed-sinc low-pass + decimate
    (resample.c:27-62): each output cell averages the input interval it
    covers, which is the alias-safe way to downsample.  Cached per size
    pair; matmul keeps the whole batch vectorized.
    """
    w = np.zeros((n_out, n_in), dtype=np.float64)
    scale = n_in / n_out
    for o in range(n_out):
        lo, hi = o * scale, (o + 1) * scale
        i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
        for i in range(i0, min(i1, n_in)):
            overlap = min(hi, i + 1) - max(lo, i)
            if overlap > 0:
                w[o, i] = overlap
    w /= w.sum(axis=1, keepdims=True)
    return w


def area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize one 2-D float array via exact area averaging -> float32.

    Deliberately ONE image per gemm: stacking same-shape images into a
    single wider dgemm (measured round 4) changes BLAS kernel/blocking
    choice with matrix size and shifts results by 1 ulp on some inputs
    — which would make fingerprints depend on Arrow batch composition.
    Bit-stability across any batching/partitioning is a correctness
    property here (signature equality joins, fixture digests), so the
    per-image formulation is canonical.
    """
    wh = _area_weights(img.shape[0], out_h)
    ww = _area_weights(img.shape[1], out_w)
    return (wh @ img.astype(np.float64) @ ww.T).astype(np.float32)


# --------------------------------------------------------------------------
# RMS normalize (audionormalizer.c:5-32), batched over [batch, N]
# --------------------------------------------------------------------------

def rms_normalize(batch: np.ndarray) -> np.ndarray:
    """clamp(sqrt(mean(x^2))*10, 0.1, 3.0); divide; clamp to [-1, 1]."""
    x = batch.astype(np.float32, copy=False)
    flat = x.reshape(x.shape[0], -1)
    rms = np.sqrt(np.mean(flat.astype(np.float64) ** 2, axis=1)) * C.RMS_COEFF
    rms = np.clip(rms, C.RMS_MIN, C.RMS_MAX).astype(np.float32)
    out = flat / rms[:, None]
    np.clip(out, -1.0, 1.0, out=out)
    return out.reshape(x.shape).astype(np.float32)


# --------------------------------------------------------------------------
# max-norm log scale (spectralimages.c:52-77), batched
# --------------------------------------------------------------------------

def scale_to_full_spectrum(batch: np.ndarray) -> np.ndarray:
    """Per image: v -> log(1 + min(255*v/max, 255)) / log(256), float32."""
    x = batch.astype(np.float32, copy=False)
    flat = x.reshape(x.shape[0], -1)
    mx = flat.max(axis=1)
    # the reference divides by max unconditionally; guard the all-zero
    # image (max==0 -> 0/0) by treating it as all-zero output
    safe = np.where(mx == 0, np.float32(1.0), mx)
    scaled = C.SCALE_CEIL * flat / safe[:, None]
    np.minimum(scaled, np.float32(C.SCALE_CEIL), out=scaled)
    out = np.log1p(scaled, dtype=np.float32) / np.float32(np.log(C.SCALE_LOG_BASE))
    return out.reshape(x.shape).astype(np.float32)


# --------------------------------------------------------------------------
# 2-D Haar transform (haar.c:23-73), batched float32
# --------------------------------------------------------------------------

def _haar_1d_axis(x: np.ndarray, axis: int) -> np.ndarray:
    """In-place-style cascading Haar along ``axis`` (length power of 2).

    Mirrors transform_array (haar.c:23-42): float32 sums, then the
    double M_SQRT2 division truncated back to float32 — bit-exact with
    the C loop for the same inputs.
    """
    x = np.moveaxis(x, axis, -1).copy()
    size = x.shape[-1]
    while size > 1:
        size //= 2
        a = x[..., 0 : 2 * size : 2]
        b = x[..., 1 : 2 * size : 2]
        s = (a + b)  # float32 add, as in C
        d = (a - b)
        lo = (s.astype(np.float64) / _SQRT2).astype(np.float32)
        hi = (d.astype(np.float64) / _SQRT2).astype(np.float32)
        x[..., :size] = lo
        x[..., size : 2 * size] = hi
    return np.moveaxis(x, -1, axis)


def haar2d(batch: np.ndarray) -> np.ndarray:
    """Standard 2-D Haar on [batch, GRID_W, GRID_H] float32 images.

    The reference stores image[i*32 + y] (frame-major) and transforms
    rows of length 128 first (haar.c:54-66), then columns of length 32
    (haar.c:70-72): here axis 1 (width 128) then axis 2 (height 32).
    """
    x = batch.astype(np.float32, copy=False)
    assert x.ndim == 3 and x.shape[1] == C.GRID_W and x.shape[2] == C.GRID_H
    x = _haar_1d_axis(x, 1)
    x = _haar_1d_axis(x, 2)
    return x


# --------------------------------------------------------------------------
# top-200 sign binarization (rawfingerprints.c:43-100), batched
# --------------------------------------------------------------------------

def topk_sign_bits(batch_coeffs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[batch, 4096] Haar coeffs -> (raw_fp uint8[batch,1024], is_silence bool).

    Selection order: decreasing |coeff| with index as tiebreak (the
    reference's qsort tie order is unspecified, rawfingerprints.c:43-53;
    we fix a total order and use the same in the oracle, SURVEY.md §5.5d).
    Bits: coeff > 0.001 -> bit 2i; coeff < -0.001 -> bit 2i+1, LSB-first
    within each byte (rawfingerprints.c:61-74).  Silence: fewer than 10
    of the top 200 have |coeff| > 1.0 (rawfingerprints.c:10-16,96).
    """
    x = batch_coeffs.reshape(batch_coeffs.shape[0], -1).astype(np.float32, copy=False)
    n, ncoef = x.shape
    absx = np.abs(x)
    # stable argsort on -|c| fixes ties by ascending index
    order = np.argsort(-absx, axis=1, kind="stable")[:, : C.TOP_WAVELETS]
    rows = np.arange(n)[:, None]
    top_vals = x[rows, order]
    n_strong = (np.abs(top_vals) > np.float32(C.TOP_WAVELET_THRESHOLD)).sum(axis=1)
    is_silence = n_strong < C.MIN_WAVELETS

    bit_pos = np.where(
        top_vals > np.float32(C.SIGN_THRESHOLD),
        2 * order,
        np.where(top_vals < np.float32(-C.SIGN_THRESHOLD), 2 * order + 1, -1),
    )
    bits = np.zeros((n, C.FP_BITS), dtype=np.uint8)
    valid = bit_pos >= 0
    bits[np.repeat(np.arange(n), valid.sum(axis=1)), bit_pos[valid]] = 1
    raw_fp = np.packbits(bits.reshape(n, C.FP_BYTES, 8), axis=2, bitorder="little")
    return raw_fp.reshape(n, C.FP_BYTES), is_silence


# --------------------------------------------------------------------------
# MinHash (minhash.c:13-54), batched via gather + argmax
# --------------------------------------------------------------------------

def minhash100(raw_fp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint8[batch,1024] packed fingerprints -> (minhash uint8[batch,100],
    degenerate bool[batch]).

    For each permutation: index of the first set bit among its first 255
    positions, sentinel 255 when none (minhash.c:17-26).  ``degenerate``
    marks all-255 signatures, which the reference drops (minhash.c:47).
    Early-exit scanning is replaced by a vectorized gather+argmax
    (SURVEY.md §4): bits[:, perm] -> [batch, 100, 255] -> argmax.
    """
    n = raw_fp.shape[0]
    bits = np.unpackbits(raw_fp.reshape(n, C.FP_BYTES, 1), axis=2, bitorder="little")
    bits = bits.reshape(n, C.FP_BITS)
    perms = load_permutations()  # [100, 255] indices into 8192 bits
    gathered = bits[:, perms]  # [batch, 100, 255]
    first = np.argmax(gathered, axis=2)  # 0 when row all-zero
    any_set = gathered.any(axis=2)
    mh = np.where(any_set, first, C.PERMUTATION_LENGTH).astype(np.uint8)
    degenerate = ~any_set.any(axis=1)
    return mh, degenerate


# --------------------------------------------------------------------------
# LSH band hashes (lsh.c:49-52), batched
# --------------------------------------------------------------------------

def band_hashes(minhash: np.ndarray) -> np.ndarray:
    """uint8[batch,100] -> int64[batch,25] big-endian uint32 band hashes."""
    n = minhash.shape[0]
    m = minhash.reshape(n, C.N_BANDS, C.BYTES_PER_BAND).astype(np.int64)
    return (m[..., 0] << 24) | (m[..., 1] << 16) | (m[..., 2] << 8) | m[..., 3]


# --------------------------------------------------------------------------
# signature scoring (search.c:35-43), batched
# --------------------------------------------------------------------------

def signature_scores(mh_a: np.ndarray, mh_b: np.ndarray) -> np.ndarray:
    """Pairwise-aligned byte-equality counts: uint8[n,100] x2 -> int32[n]."""
    return (mh_a == mh_b).sum(axis=1).astype(np.int32)


# --------------------------------------------------------------------------
# full chain: grayscale grid -> signature row
# --------------------------------------------------------------------------

def grid_to_signature(grids: np.ndarray) -> dict[str, np.ndarray]:
    """[batch, GRID_W, GRID_H] float32 grids in [0,1] -> chain outputs.

    Returns dict with raw_fp [n,1024] u8, minhash [n,100] u8,
    is_silence bool[n], degenerate bool[n].
    """
    normed = rms_normalize(grids)
    scaled = scale_to_full_spectrum(normed)
    coeffs = haar2d(scaled)
    raw_fp, is_silence = topk_sign_bits(coeffs.reshape(grids.shape[0], -1))
    mh, degenerate = minhash100(raw_fp)
    return {
        "raw_fp": raw_fp,
        "minhash": mh,
        "is_silence": is_silence,
        "degenerate": degenerate,
    }


def luma_to_grid(luma: np.ndarray) -> np.ndarray:
    """One grayscale image [h, w] (0..255 float) -> [GRID_W, GRID_H] grid
    in [0,1].

    The grid is frame-major like the reference's spectral image: axis 0 =
    width analog (128 "frames"), axis 1 = height analog (32 "bins"), so
    we resize to (GRID_H rows, GRID_W cols) then transpose.
    """
    small = area_resize(luma, C.GRID_H, C.GRID_W)  # [32, 128]
    return (small.T / np.float32(255.0)).astype(np.float32)  # [128, 32]

"""Kernel cross-checks against independent naive reimplementations.

The Spark pipeline and the oracle share the vectorized kernels, so
these tests are the independent leg of the pyramid (SURVEY.md §5.1):
each hot kernel is re-implemented here the slow, obvious way, straight
from the cited C loops, and must agree exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mnemophonix_spark import config as C
from mnemophonix_spark.functions import kernels


# --------------------------------------------------------------------------
# permutation table parity (SURVEY.md §5.2)
# --------------------------------------------------------------------------

def test_permutation_table_shape_and_range():
    t = kernels.load_permutations()
    assert t.shape == (100, 255)
    assert t.dtype == np.uint16
    assert t.min() >= 0 and t.max() <= 8191


def test_permutation_table_spot_values():
    # literals from /root/reference/permutations.c:9 (row 0) and the
    # start of row 1
    t = kernels.load_permutations()
    assert t[0, :6].tolist() == [532, 5740, 4559, 4197, 2086, 1876]
    assert t[1, :4].tolist() == [3243, 6108, 1017, 3418]
    # rows are prefixes of permutations: no duplicate indexes within a row
    for r in range(100):
        assert len(set(t[r].tolist())) == 255


# --------------------------------------------------------------------------
# Haar vs naive recursion (haar.c:23-42)
# --------------------------------------------------------------------------

def _naive_haar_1d(data: np.ndarray) -> np.ndarray:
    data = data.astype(np.float32).copy()
    size = data.shape[0]
    while size > 1:
        size //= 2
        tmp = np.empty(2 * size, dtype=np.float32)
        for i in range(size):
            s = np.float32(data[2 * i] + data[2 * i + 1])
            d = np.float32(data[2 * i] - data[2 * i + 1])
            tmp[i] = np.float32(np.float64(s) / np.float64(np.sqrt(2.0)))
            tmp[i + size] = np.float32(np.float64(d) / np.float64(np.sqrt(2.0)))
        data[: 2 * size] = tmp
    return data


def _naive_haar_2d(img: np.ndarray) -> np.ndarray:
    # rows of length 128 first (haar.c:54-66), then columns of length 32
    out = img.astype(np.float32).copy()
    for y in range(C.GRID_H):
        out[:, y] = _naive_haar_1d(out[:, y])
    for i in range(C.GRID_W):
        out[i, :] = _naive_haar_1d(out[i, :])
    return out


def test_haar2d_matches_naive():
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, size=(4, C.GRID_W, C.GRID_H)).astype(np.float32)
    fast = kernels.haar2d(imgs)
    for k in range(4):
        naive = _naive_haar_2d(imgs[k])
        assert np.array_equal(fast[k], naive)


def test_haar_energy_preservation():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, size=(1, C.GRID_W, C.GRID_H)).astype(np.float32)
    out = kernels.haar2d(img)
    assert np.isclose(
        np.sum(img.astype(np.float64) ** 2),
        np.sum(out.astype(np.float64) ** 2),
        rtol=1e-4,
    )


# --------------------------------------------------------------------------
# top-k sign bits vs naive loop (rawfingerprints.c:61-100)
# --------------------------------------------------------------------------

def _naive_topk_bits(coeffs: np.ndarray) -> tuple[bytes, bool]:
    order = sorted(range(coeffs.size), key=lambda j: (-abs(coeffs[j]), j))
    top = order[: C.TOP_WAVELETS]
    bits = bytearray(C.FP_BYTES)
    n_strong = 0
    for j in top:
        c = coeffs[j]
        if c > 0.001:
            pos = 2 * j
            bits[pos // 8] |= 1 << (pos % 8)
        elif c < -0.001:
            pos = 2 * j + 1
            bits[pos // 8] |= 1 << (pos % 8)
        if abs(c) > 1.0:
            n_strong += 1
    return bytes(bits), n_strong < C.MIN_WAVELETS


def test_topk_sign_bits_matches_naive():
    rng = np.random.default_rng(5)
    coeffs = (rng.standard_normal((3, C.GRID_SIZE)) * 2).astype(np.float32)
    raw_fp, silence = kernels.topk_sign_bits(coeffs)
    for k in range(3):
        nb, ns = _naive_topk_bits(coeffs[k])
        assert raw_fp[k].tobytes() == nb
        assert bool(silence[k]) == ns


# --------------------------------------------------------------------------
# MinHash vs naive scan (minhash.c:13-28)
# --------------------------------------------------------------------------

def _naive_minhash(raw_fp: bytes) -> bytes:
    perms = kernels.load_permutations()
    out = bytearray()
    for i in range(C.N_PERMUTATIONS):
        val = C.PERMUTATION_LENGTH
        for j in range(C.PERMUTATION_LENGTH):
            bit_index = int(perms[i, j])
            if raw_fp[bit_index // 8] & (1 << (bit_index % 8)):
                val = j
                break
        out.append(val)
    return bytes(out)


def test_minhash_matches_naive():
    rng = np.random.default_rng(6)
    coeffs = (rng.standard_normal((3, C.GRID_SIZE)) * 2).astype(np.float32)
    raw_fp, _ = kernels.topk_sign_bits(coeffs)
    mh, degenerate = kernels.minhash100(raw_fp)
    for k in range(3):
        assert mh[k].tobytes() == _naive_minhash(raw_fp[k].tobytes())
    assert not degenerate.any()


def test_minhash_degenerate_all_zero_fingerprint():
    raw_fp = np.zeros((1, C.FP_BYTES), dtype=np.uint8)
    mh, degenerate = kernels.minhash100(raw_fp)
    assert degenerate[0]
    assert (mh[0] == 255).all()


# --------------------------------------------------------------------------
# band hashes vs naive big-endian pack (lsh.c:49-52)
# --------------------------------------------------------------------------

def test_band_hashes_big_endian():
    rng = np.random.default_rng(7)
    mh = rng.integers(0, 256, size=(2, 100), dtype=np.uint8)
    bands = kernels.band_hashes(mh)
    for k in range(2):
        for band in range(C.N_BANDS):
            b = mh[k, band * 4 : band * 4 + 4]
            expected = (int(b[0]) << 24) | (int(b[1]) << 16) | (int(b[2]) << 8) | int(b[3])
            assert bands[k, band] == expected


# --------------------------------------------------------------------------
# properties (SURVEY.md §5.4)
# --------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_identical_signatures_share_all_bands(seed):
    rng = np.random.default_rng(seed)
    mh = rng.integers(0, 256, size=(1, 100), dtype=np.uint8)
    b1 = kernels.band_hashes(mh)
    b2 = kernels.band_hashes(mh.copy())
    assert (b1 == b2).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1), st.floats(0.1, 0.9))
def test_minhash_agreement_tracks_jaccard(seed, keep_prob):
    """MinHash contract (minhash.h:33-87): expected agreement between two
    signatures approximates the Jaccard similarity of their bit sets."""
    rng = np.random.default_rng(seed)
    bits_a = (rng.random(C.FP_BITS) < 0.03).astype(np.uint8)
    flip = rng.random(C.FP_BITS) < (1 - keep_prob) * 0.03
    bits_b = np.where(flip, 1 - bits_a, bits_a).astype(np.uint8)
    inter = int((bits_a & bits_b).sum())
    union = int((bits_a | bits_b).sum())
    if union == 0:
        return
    jaccard = inter / union
    pack = lambda b: np.packbits(  # noqa: E731
        b.reshape(1, C.FP_BYTES, 8), axis=2, bitorder="little"
    ).reshape(1, C.FP_BYTES)
    mh_a, _ = kernels.minhash100(pack(bits_a))
    mh_b, _ = kernels.minhash100(pack(bits_b))
    # exclude double-sentinel agreements (both 255 = neither found a bit)
    both_found = (mh_a[0] != 255) | (mh_b[0] != 255)
    if both_found.sum() < 20:
        return
    agreement = float((mh_a[0] == mh_b[0])[both_found].mean())
    assert abs(agreement - jaccard) < 0.35  # 100 perms -> loose bound


# --------------------------------------------------------------------------
# resize + normalize + scale sanity
# --------------------------------------------------------------------------

def test_area_resize_preserves_mean():
    rng = np.random.default_rng(8)
    img = rng.uniform(0, 255, size=(96, 128))
    small = kernels.area_resize(img, 32, 128)
    assert np.isclose(small.mean(), img.mean(), rtol=1e-3)


def test_area_resize_identity():
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 255, size=(32, 128)).astype(np.float32)
    out = kernels.area_resize(img, 32, 128)
    assert np.allclose(out, img, atol=1e-3)


def test_rms_normalize_matches_reference_formula():
    rng = np.random.default_rng(10)
    x = rng.uniform(0, 1, size=(1, 64)).astype(np.float32)
    out = kernels.rms_normalize(x)
    rms = np.sqrt(np.mean(x.astype(np.float64) ** 2)) * 10.0
    rms = min(max(rms, 0.1), 3.0)
    expected = np.clip(x / np.float32(rms), -1.0, 1.0)
    assert np.allclose(out, expected, atol=1e-6)


def test_scale_to_full_spectrum_range_and_formula():
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 0.4, size=(1, 4096)).astype(np.float32)
    out = kernels.scale_to_full_spectrum(x)
    assert out.min() >= 0.0 and out.max() <= 1.0
    mx = x.max()
    expected = np.log1p(np.minimum(255.0 * x / mx, 255.0)) / np.log(256.0)
    assert np.allclose(out, expected, atol=1e-5)
    # max element maps to exactly 1.0
    assert np.isclose(out.flatten()[x.argmax()], 1.0, atol=1e-6)


def test_scale_all_zero_image_is_zero():
    out = kernels.scale_to_full_spectrum(np.zeros((1, 16), np.float32))
    assert (out == 0).all()


def test_signature_scores():
    a = np.zeros((2, 100), np.uint8)
    b = np.zeros((2, 100), np.uint8)
    b[0, :40] = 1
    s = kernels.signature_scores(a, b)
    assert s.tolist() == [60, 100]

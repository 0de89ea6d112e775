"""Single-process NumPy oracle for the full dedup chain.

This is the correctness anchor (SURVEY.md §5.1): a dependency-light,
non-Spark implementation of corpus -> signatures -> bands -> candidate
pairs -> accepted pairs -> clusters.  The Spark engine must reproduce
its signature bytes bit-for-bit and its pair/cluster outputs exactly.

The pair/cluster logic here is written independently of the Spark
operators (plain dict/union-find, no shared shuffle code); the kernel
stages reuse ``functions.kernels`` and are themselves cross-checked
against naive reimplementations in tests/test_kernels.py.

Pair-acceptance semantics for single-signature images (one signature
per image, sig_idx=0): a pair is accepted iff it shares >= 2 of the 25
band hashes (search.c:11 MIN_BUCKET_MATCH_FOR_DEEP_CHECK) and its
byte-equality score is >= 30 of 100 (search.c:16,35-43).  The
reference's per-entry aggregate thresholds (search.c:19-29,179-180)
collapse to this rule when n_signatures == 1; the multi-signature
aggregation is implemented for parity in ``aggregate_entry_scores``.
Unlike the reference, the last candidate group IS scored (the reference
silently drops it, search.c:148-165 — SURVEY.md §5.5a).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

from mnemophonix_spark import codecs
from mnemophonix_spark import config as C
from mnemophonix_spark.functions import kernels


@dataclass
class OracleResult:
    image_ids: list[str]
    grids: np.ndarray           # float32 [n, 128, 32] canonical grids
    raw_fp: np.ndarray          # uint8 [n, 1024]
    minhash: np.ndarray         # uint8 [n, 100]
    is_silence: np.ndarray      # bool [n]
    degenerate: np.ndarray      # bool [n]
    bands: np.ndarray           # int64 [n, 25]
    pairs: list[tuple[str, str, int, int]]   # (id_a, id_b, n_shared_bands, score)
    verified_pairs: list[tuple[str, str, float]]  # + grid PSNR >= 40 dB
    clusters: dict[str, str]    # image_id -> cluster_id (min id in component)


def fingerprint_rows(rows: list[tuple[str, bytes, str]]) -> tuple[list[str], dict[str, np.ndarray]]:
    """rows of (image_id, bytes, fmt) -> (ids, chain outputs).

    Decodes one image at a time (the oracle is intentionally
    single-process and simple); undecodable rows are dropped the way the
    engine quarantines them.
    """
    ids: list[str] = []
    grids: list[np.ndarray] = []
    for image_id, data, fmt in rows:
        try:
            luma = codecs.decode(data, fmt)
        except codecs.CodecError:
            continue
        ids.append(image_id)
        grids.append(kernels.luma_to_grid(luma))
    stacked = (
        np.stack(grids) if grids else np.zeros((0, C.GRID_W, C.GRID_H), np.float32)
    )
    out = kernels.grid_to_signature(stacked) if grids else {
        "raw_fp": np.zeros((0, C.FP_BYTES), np.uint8),
        "minhash": np.zeros((0, C.SIGNATURE_LENGTH), np.uint8),
        "is_silence": np.zeros(0, bool),
        "degenerate": np.zeros(0, bool),
    }
    out["grids"] = stacked
    return ids, out


def candidate_pairs(
    ids: list[str], bands: np.ndarray, valid: np.ndarray
) -> dict[tuple[str, str], int]:
    """Band-bucket pairing: (id_a, id_b) -> number of shared bands.

    Plain-dict reimplementation of the LSH probe (lsh.c:89-112) joined
    on the raw band hash (not hash mod table-size — SURVEY.md §5.5b).
    """
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, row in enumerate(bands):
        if not valid[i]:
            continue
        for band_id in range(C.N_BANDS):
            buckets[(band_id, int(row[band_id]))].append(i)
    counts: dict[tuple[str, str], int] = defaultdict(int)
    for members in buckets.values():
        if len(members) < 2:
            continue
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = ids[members[ai]], ids[members[bi]]
                key = (a, b) if a < b else (b, a)
                counts[key] += 1
    return counts


def union_find_clusters(ids: list[str], pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Connected components; cluster_id = min image_id in the component."""
    parent = {i: i for i in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def run_chain(
    rows: list[tuple[str, bytes, str]],
    phash: dict[str, int] | None = None,
) -> OracleResult:
    ids, out = fingerprint_rows(rows)
    bands = kernels.band_hashes(out["minhash"])
    valid = ~out["is_silence"] & ~out["degenerate"]
    idx = {img: i for i, img in enumerate(ids)}

    shared = candidate_pairs(ids, bands, valid)
    pairs: list[tuple[str, str, int, int]] = []
    for (a, b), n_shared in sorted(shared.items()):
        if n_shared < C.MIN_BAND_MATCHES:
            continue
        score = int((out["minhash"][idx[a]] == out["minhash"][idx[b]]).sum())
        if score >= C.MIN_SCORE:
            pairs.append((a, b, n_shared, score))

    # verification pass (north_star): decoded-pixel PSNR on the canonical
    # grids >= 40 dB, OR phash hamming <= 4 (cross-resize dups alias on
    # the grid but keep phash within 1 bit); kills LSH false positives
    verified: list[tuple[str, str, float]] = []
    for a, b, _, _ in pairs:
        p = grid_psnr(out["grids"][idx[a]], out["grids"][idx[b]])
        ok = p >= C.PSNR_MIN_DB
        if not ok and phash is not None and a in phash and b in phash:
            ham = bin((phash[a] ^ phash[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            ok = ham <= C.PHASH_MAX_HAMMING
        if ok:
            verified.append((a, b, p))

    clusters = union_find_clusters(ids, [(a, b) for a, b, _ in verified])
    return OracleResult(
        image_ids=ids,
        grids=out["grids"],
        raw_fp=out["raw_fp"],
        minhash=out["minhash"],
        is_silence=out["is_silence"],
        degenerate=out["degenerate"],
        bands=bands,
        pairs=pairs,
        verified_pairs=verified,
        clusters=clusters,
    )


def grid_psnr(grid_a: np.ndarray, grid_b: np.ndarray) -> float:
    """PSNR between two canonical [0,1] grids, on the 0..255 scale."""
    return codecs.psnr(grid_a * 255.0, grid_b * 255.0)


def aggregate_entry_scores(
    sig_scores: list[tuple[str, int, int]]
) -> list[tuple[str, float, int, bool]]:
    """Multi-signature per-entry aggregation + accept rule (search.c:110-185).

    sig_scores: (entry_id, signature_score, _) rows that already passed
    the >=2-band and >=MIN_SCORE gates.  Returns (entry_id, avg_score,
    n_matches, accepted) with the reference thresholds: accepted iff
    (n_matches >= 10 or (avg >= 35 and n_matches >= 5)) and avg >= 30.
    """
    agg: dict[str, tuple[float, int]] = defaultdict(lambda: (0.0, 0))
    for entry_id, score, _ in sig_scores:
        s, n = agg[entry_id]
        agg[entry_id] = (s + score, n + 1)
    out = []
    for entry_id, (s, n) in sorted(agg.items()):
        avg = 0.0 if n == 0 else s / n
        accepted = (
            n >= C.MIN_SIGNATURE_MATCHES
            or (avg >= C.GOOD_SCORE and n >= C.MIN_SIGNATURE_MATCHES // 2)
        ) and avg >= C.MIN_AVERAGE_SCORE
        out.append((entry_id, avg, n, accepted))
    return out

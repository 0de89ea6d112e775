"""Chain constants for the PySpark-native near-duplicate engine.

Every number is grafted from the reference fingerprint chain
(gurushida/mnemophonix, read-only at /root/reference) with a file:line
citation.  The reference is a Shazam-style audio fingerprinter; this
engine re-expresses its semantic chain over image+caption rows, so a
few constants change meaning (documented inline) but keep their values
so the MinHash/LSH statistics carry over.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# --- canonical grid (reference: spectral image geometry) -----------------
# reference/spectralimages.h:12  SPECTRAL_IMAGE_WIDTH = 128 (frames per image)
GRID_W = 128
# reference/spectralimages.h (NUMBER_OF_BINS via logbins.h) = 32 frequency bins
GRID_H = 32
# total coefficients per image = 128*32 = 4096 (reference/spectralimages.h:37-39)
GRID_SIZE = GRID_W * GRID_H

# --- RMS normalization (reference/audionormalizer.c:5-32) ----------------
RMS_COEFF = 10.0   # audionormalizer.c:11-20 (magic values from soundfingerprinting)
RMS_MIN = 0.1
RMS_MAX = 3.0

# --- spectral scaling (reference/spectralimages.c:52-58) -----------------
SCALE_CEIL = 255.0  # scale(): 255*v/max clamped at 255, then log(1+x)/log(256)
SCALE_LOG_BASE = 256.0

# --- top-k wavelet binarization (reference/rawfingerprints.c) ------------
TOP_WAVELETS = 200          # rawfingerprints.h:13
SIGN_THRESHOLD = 0.001      # rawfingerprints.c:64-69 (>0.001 / <-0.001)
TOP_WAVELET_THRESHOLD = 1.0  # rawfingerprints.c:10
MIN_WAVELETS = 10           # rawfingerprints.c:16 (silence if fewer pass)
FP_BITS = 2 * GRID_SIZE     # 8192 bits, 2 per cell (rawfingerprints.h:16-29)
FP_BYTES = FP_BITS // 8     # 1024

# --- MinHash (reference/permutations.h, minhash.h) ------------------------
N_PERMUTATIONS = 100        # permutations.h:7
PERMUTATION_LENGTH = 255    # permutations.h:10 (probe depth; 255 is the sentinel)
SIGNATURE_LENGTH = N_PERMUTATIONS  # minhash.h:7 (100 bytes per signature)
PERMUTATION_SEED = 678233   # generatepermutations.c:31 (table is frozen data)

# --- LSH banding (reference/lsh.h:7-9, lsh.c:49-52) ----------------------
N_BANDS = 25                # lsh.h N_BUCKETS  (north_star text says 20; the
                            # reference code is 25 bands x 4 bytes — we follow
                            # the code, SURVEY.md §2.14)
BYTES_PER_BAND = 4          # lsh.h BYTES_PER_BUCKET_HASH

# --- match thresholds (reference/search.c) --------------------------------
MIN_BAND_MATCHES = 2        # search.c:11 MIN_BUCKET_MATCH_FOR_DEEP_CHECK
MIN_SCORE = 30              # search.c:16 (equal bytes out of 100)
MIN_SIGNATURE_MATCHES = 10  # search.c:21 (multi-signature entries only)
MIN_AVERAGE_SCORE = 30      # search.c:25
GOOD_SCORE = 35             # search.c:29

# --- verification pass (north_star, no reference counterpart) -------------
PSNR_MIN_DB = 40.0          # decoded-pixel verification for lossy formats
PHASH_MAX_HAMMING = 4       # cross-resize dups alias on the canonical grid
                            # (moire on textured bands), but their 8x8
                            # mean-threshold phash stays within 1 bit while
                            # distinct images sit at >=11; a pair verifies if
                            # PSNR>=40 OR phash hamming <= 4

# --- caption channel (north_star, no reference counterpart) ---------------
SIMHASH_BITS = 64
SIMHASH_SHINGLE = 3         # word shingles
SIMHASH_MAX_HAMMING = 3

# --- LSH skew handling -----------------------------------------------------
# buckets larger than this are capped (salted sample) — standard LSH
# practice; the reference's analog is collision tolerance in its
# mod-size tables (lsh.c:61-74)
MAX_BUCKET_SIZE = 256

# --- pair-side broadcast policy (score_pairs / verify_pairs) ---------------
# "auto"  : broadcast only when Catalyst's plan-time size estimate fits
#           under BROADCAST_MAX_BYTES.  Exact whenever the pair stage is
#           checkpointed/persisted (parquet-backed stats); an estimate
#           otherwise.
# "force" : unconditional broadcast hint (round-1 behavior; correct when
#           the candidate set is known small).
# "never" : plan shuffle joins and let AQE convert to broadcast from
#           RUNTIME sizes — the fully skew-safe mode for pathological
#           corpora (mass duplicates) where plan-time estimates cannot
#           see the quadratic pair blow-up.
PAIR_BROADCAST_MODE = os.environ.get("SPARK_GRAFT_PAIR_BROADCAST", "auto")
BROADCAST_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_BROADCAST_MAX_BYTES", str(64 << 20))
)

# --- SimHash engine path (dedup_text.simhash64_engine) ---------------------
# "packed":  one Arrow pass per row, md5 -> uint64 bit ops (the scale
#            path; zero shuffle amplification).
# "explode": the id x word x 64-bit column-expression formulation that
#            mirrors the SQL oracle exactly (kept for cross-checks).
SIMHASH_IMPL = os.environ.get("SPARK_GRAFT_SIMHASH_IMPL", "packed")

# --- hyperplane LSH bucket builder (similarity.lsh_ann_topk) ---------------
# "matmul":  Arrow-batched [batch, dim] @ [dim, planes] per table (the
#            scale path; zero Exchange before the (id, bucket) result).
# "explode": the id x dim x plane column-expression oracle formulation.
LSH_BUCKET_IMPL = os.environ.get("SPARK_GRAFT_LSH_BUCKET_IMPL", "matmul")

# --- shingle-explode fan-out rebalance (dedup_text._fanout_rebalance) ------
# "auto": repartition to default parallelism when the scan's file index
#         is narrower than the core count; "always" / "off" override.
FANOUT_REBALANCE = os.environ.get("SPARK_GRAFT_FANOUT_REBALANCE", "auto")

# --- Spark session defaults ------------------------------------------------
SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
ARROW_BATCH_ROWS = 256      # images are heavy; keep Arrow batches modest


@dataclass(frozen=True)
class ChainConfig:
    """Runtime-tunable subset (kept at reference defaults for parity)."""

    grid_w: int = GRID_W
    grid_h: int = GRID_H
    top_wavelets: int = TOP_WAVELETS
    n_permutations: int = N_PERMUTATIONS
    permutation_length: int = PERMUTATION_LENGTH
    n_bands: int = N_BANDS
    bytes_per_band: int = BYTES_PER_BAND
    min_band_matches: int = MIN_BAND_MATCHES
    min_score: int = MIN_SCORE


DEFAULT_CHAIN = ChainConfig()

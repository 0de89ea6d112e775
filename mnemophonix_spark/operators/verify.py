"""Pair verification: decoded-pixel PSNR + phash hamming (north_star).

No reference counterpart (the reference trusts its signature score);
this stage kills LSH false positives before clustering.  A pair
verifies if PSNR(grid_a, grid_b) >= 40 dB OR hamming64(phash_a,
phash_b) <= 4 (cross-resize dups alias on the canonical grid — moire
on textured regions — but stay within a bit of phash, while distinct
images sit at >= 11 bits; see config.PHASH_MAX_HAMMING).

Scale design: pixels are re-decoded ONLY for candidate pairs (a tiny
fraction of the corpus), never materialized corpus-wide.  The phash
gate is a pure column op evaluated first so the expensive decode join
only runs for pairs the cheap gate could not accept.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mnemophonix_spark import codecs
from mnemophonix_spark import config as C

_PSNR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.StringType()),
        T.StructField("id_b", T.StringType()),
        T.StructField("n_shared_bands", T.LongType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("psnr", T.DoubleType()),
    ]
)


def _psnr_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from mnemophonix_spark.functions import kernels

    for batch in batches:
        d = batch.to_pydict()
        n = len(d["id_a"])
        psnr = np.zeros(n, dtype=np.float64)
        # both pair sides decode through the batched path: same-shape
        # Average/Paeth PNGs across the whole batch share one wavefront
        decoded = codecs.decode_batch(
            d["bytes_a"] + d["bytes_b"], d["fmt_a"] + d["fmt_b"]
        )
        for i in range(n):
            da, db = decoded[i], decoded[n + i]
            if isinstance(da, codecs.CodecError) or isinstance(db, codecs.CodecError):
                psnr[i] = 0.0
                continue
            ga = kernels.luma_to_grid(da)
            gb = kernels.luma_to_grid(db)
            psnr[i] = codecs.psnr(ga * 255.0, gb * 255.0)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(d["id_a"], pa.string()),
                pa.array(d["id_b"], pa.string()),
                pa.array(d["n_shared_bands"], pa.int64()),
                pa.array(d["score"], pa.int32()),
                pa.array(psnr, pa.float64()),
            ],
            names=["id_a", "id_b", "n_shared_bands", "score", "psnr"],
        )


def verify_pairs(
    scored: DataFrame,
    corpus: DataFrame,
    psnr_min: float = C.PSNR_MIN_DB,
    phash_max_hamming: int = C.PHASH_MAX_HAMMING,
    broadcast: bool | None = None,
) -> DataFrame:
    """scored pairs + corpus -> verified pairs.

    Output: (id_a, id_b, n_shared_bands, score, verified_by string).
    """
    from mnemophonix_spark.operators.lsh import broadcast_decision

    # the scored-pair side is usually tiny relative to the corpus:
    # broadcast it through both joins so the corpus streams once with
    # no shuffle — size-aware (config.PAIR_BROADCAST_MODE): ONE
    # decision governs the narrow pair frames, since every later frame
    # here is row-bounded by scored.  The pipeline passes the decision
    # from the materialized candidates stage's EXACT stats (pairs only
    # shrink downstream), avoiding a scored-count job barrier;
    # standalone use estimates from scored itself.  Pathological pair
    # sets fall back to shuffle joins AQE can re-plan.
    if broadcast is None:
        broadcast = broadcast_decision(scored)
    bc = F.broadcast if broadcast else (lambda df: df)
    # the payload frame carries image bytes (orders of magnitude wider
    # than a pair row): require BOTH the pair decision and a tighter
    # plan-estimate budget before letting bytes ride a broadcast
    bc_payload = (
        F.broadcast
        if broadcast
        and broadcast_decision(scored, limit_bytes=C.BROADCAST_MAX_BYTES // 64)
        else (lambda df: df)
    )
    ph = corpus.select("image_id", "phash")
    step1 = ph.withColumnRenamed("image_id", "id_a").withColumnRenamed(
        "phash", "phash_a"
    ).join(bc(scored), "id_a")
    with_ph = (
        ph.withColumnRenamed("image_id", "id_b")
        .withColumnRenamed("phash", "phash_b")
        .join(bc(step1), "id_b")
        .withColumn(
            "phash_ham",
            F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b"))),
        )
    )
    cheap_ok = with_ph.filter(F.col("phash_ham") <= phash_max_hamming).select(
        "id_a",
        "id_b",
        "n_shared_bands",
        "score",
        F.lit("phash").alias("verified_by"),
    )
    needs_pixels = with_ph.filter(F.col("phash_ham") > phash_max_hamming).select(
        "id_a", "id_b", "n_shared_bands", "score"
    )

    # payload joins: broadcast the (tiny) leftover pair list; image
    # bytes stream from the scan, are filtered by the broadcast hash
    # join, and only candidate rows' bytes ever leave the scan stage
    payload = corpus.select("image_id", "bytes", "fmt")
    step_a = payload.select(
        F.col("image_id").alias("id_a"),
        F.col("bytes").alias("bytes_a"),
        F.col("fmt").alias("fmt_a"),
    ).join(bc(needs_pixels), "id_a")
    joined = payload.select(
        F.col("image_id").alias("id_b"),
        F.col("bytes").alias("bytes_b"),
        F.col("fmt").alias("fmt_b"),
    ).join(
        # bytes_a rides inside the broadcast only under the tighter
        # payload budget: the leftover set (phash gate already passed
        # the easy pairs) is usually tiny, but image payloads are wide
        # — oversize pair sets shuffle instead of flooding the driver
        bc_payload(step_a),
        "id_b",
    ).select(
        "id_a", "id_b", "n_shared_bands", "score", "bytes_a", "fmt_a",
        "bytes_b", "fmt_b",
    )
    pixel_ok = (
        joined.mapInArrow(_psnr_batches, _PSNR_SCHEMA)
        .filter(F.col("psnr") >= psnr_min)
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            "score",
            F.lit("psnr").alias("verified_by"),
        )
    )
    return cheap_ok.unionByName(pixel_ok)

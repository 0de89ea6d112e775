"""Corpus scan -> signatures table, one ``mapInArrow`` stage, no shuffle.

Spark-side expression of reference operators 1-14 (SURVEY.md §2): the
whole decode -> grid -> normalize -> scale -> Haar -> top-200 bits ->
MinHash -> band-hash chain runs batch-wise inside Arrow record batches
(the reference's 8-pthread fan-out, spectralimages.c:160-218, becomes
task-per-partition parallelism).  Per-row Python is confined to the
variable-length image decode (zlib/struct do the byte work in C); all
math is NumPy over ``[batch, ...]`` arrays.

Output schema (FIXTURES.md F2 + band array for the LSH explode):
  image_id string, sig_idx int, raw_fp binary(1024), minhash binary(100),
  is_silence boolean, degenerate boolean, bands array<long>(25),
  phash long, caption string, decode_error string (null when ok)

Undecodable rows are QUARANTINED, not fatal: they come out with
decode_error set and null payloads (the analog of the reference's
strict wav validation, wav.c:136-139, which aborts the file — here one
bad row must not kill a 10^12-row job).
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

SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("sig_idx", T.IntegerType()),
        T.StructField("raw_fp", T.BinaryType()),
        T.StructField("minhash", T.BinaryType()),
        T.StructField("is_silence", T.BooleanType()),
        T.StructField("degenerate", T.BooleanType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
        T.StructField("phash", T.LongType()),
        T.StructField("caption", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("sig_idx", pa.int32()),
        ("raw_fp", pa.binary()),
        ("minhash", pa.binary()),
        ("is_silence", pa.bool_()),
        ("degenerate", pa.bool_()),
        ("bands", pa.list_(pa.int64())),
        ("phash", pa.int64()),
        ("caption", pa.string()),
        ("decode_error", pa.string()),
    ]
)


def _fingerprint_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    # import inside the task so the function ships cleanly to executors
    from mnemophonix_spark.functions import kernels

    for batch in batches:
        n = batch.num_rows
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        phash = batch.column("phash").to_pylist()
        caption = batch.column("caption").to_pylist()

        grids = np.zeros((n, C.GRID_W, C.GRID_H), dtype=np.float32)
        errors: list[str | None] = [None] * n
        ok = np.zeros(n, dtype=bool)
        # batch decode: same-shape Average/Paeth PNGs share one batched
        # wavefront; malformed rows come back as CodecError values and
        # are quarantined, never fatal
        decoded = codecs.decode_batch(payloads, fmts)
        for i in range(n):
            if isinstance(decoded[i], codecs.CodecError):
                errors[i] = str(decoded[i])
            else:
                grids[i] = kernels.luma_to_grid(decoded[i])
                ok[i] = True

        out = kernels.grid_to_signature(grids)
        bands = kernels.band_hashes(out["minhash"])

        raw_fp_col = [
            out["raw_fp"][i].tobytes() if ok[i] else None for i in range(n)
        ]
        minhash_col = [
            out["minhash"][i].tobytes() if ok[i] else None for i in range(n)
        ]
        bands_col = [bands[i].tolist() if ok[i] else None for i in range(n)]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array([0] * n, pa.int32()),
                pa.array(raw_fp_col, pa.binary()),
                pa.array(minhash_col, pa.binary()),
                pa.array(
                    [bool(out["is_silence"][i]) if ok[i] else None for i in range(n)],
                    pa.bool_(),
                ),
                pa.array(
                    [bool(out["degenerate"][i]) if ok[i] else None for i in range(n)],
                    pa.bool_(),
                ),
                pa.array(bands_col, pa.list_(pa.int64())),
                pa.array(phash, pa.int64()),
                pa.array(caption, pa.string()),
                pa.array(errors, pa.string()),
            ],
            schema=_ARROW_SCHEMA,
        )


def fingerprint(corpus: DataFrame) -> DataFrame:
    """corpus (input_hint schema) -> signatures DataFrame.

    Column-prunes the scan to exactly what the chain needs before the
    Arrow stage so parquet reads no dead columns.
    """
    pruned = corpus.select("image_id", "bytes", "fmt", "phash", "caption")
    return pruned.mapInArrow(_fingerprint_batches, SIGNATURE_SCHEMA)


def valid_signatures(signatures: DataFrame) -> DataFrame:
    """Rows that carry a usable signature (minhash.c:47 skip semantics)."""
    return signatures.filter(
        F.col("decode_error").isNull()
        & ~F.col("is_silence")
        & ~F.col("degenerate")
    )


def quarantined(signatures: DataFrame) -> DataFrame:
    """The quarantine sink view: undecodable rows with their reason
    (wav.c:136-139 analog — the reference aborts the file, a 10^12-row
    job routes and reports instead)."""
    return signatures.filter(F.col("decode_error").isNotNull()).select(
        "image_id", "decode_error"
    )

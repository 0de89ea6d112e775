"""Perceptual-hash blocking: the cheap dedup channel the LSH chain lacks.

The corpus carries a 64-bit mean-threshold phash per image (input_hint
column).  MinHash-LSH recall drops exactly where phash shines —
cross-resize duplicates whose canonical grids alias (measured at bench
scale: the only missed truth pairs share 0-1 of 25 bands yet sit
within 1 phash bit) — so this channel complements the signature chain
at near-zero cost: pure column expressions, one groupBy-sized shuffle.

Banding: 4 x 16-bit substrings of the zero-padded hex phash.  Any pair
within hamming <= 3 shares at least one intact band (pigeonhole);
hamming 4 is caught unless the 4 flipped bits hit all 4 bands.  The
gate then verifies exact hamming via bit_count(xor).

Production use: union these pairs with the verified signature pairs
before clustering.  The default pipeline keeps channels separate so
each stays independently oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemophonix_spark import config as C


def phash_dup_pairs(
    corpus: DataFrame,
    max_hamming: int = C.PHASH_MAX_HAMMING,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, hamming) for phash near-duplicates via band blocking."""
    n_bands, width = 4, 4  # 4 bands x 4 hex chars = 16 bits each
    hexed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(phash_col).alias("ph"),
        F.lpad(F.hex(F.col(phash_col)), 16, "0").alias("hx"),
    )
    bands = hexed.select(
        "id",
        "ph",
        "hx",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band_id"),
    ).withColumn("band_key", F.substring("hx", F.col("band_id") * width + 1, width))
    a = bands.select(F.col("id").alias("id_a"), F.col("ph").alias("ph_a"),
                     "band_id", "band_key")
    b = bands.select(F.col("id").alias("id_b"), F.col("ph").alias("ph_b"),
                     "band_id", "band_key")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

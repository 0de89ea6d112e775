"""Caption channel: exact, SimHash near-dup, and substring-containment
pairs over the corpus caption column (north_star additions; the
reference has no text channel — SURVEY.md §7.6).

Three passes, all pure column expressions:

1. exact: identical normalized caption (md5 join — the caption twin of
   exact image re-encode dedup).
2. simhash: 64-bit SimHash over words, banded into 4x16-bit substrings
   for LSH blocking, verified by exact hamming <= SIMHASH_MAX_HAMMING.
   Banding is sound for the hamming radius: 4 bands, <=3 differing bits
   -> at least one band is identical (pigeonhole).
3. substring: caption of A is a strict substring of caption of B.
   Blocking: A's first-k-word shingle must appear among B's k-word
   shingles (true whenever A has >= k words and A is a substring of B);
   verification: exact `contains`.  Captions shorter than k words fall
   back to an exact-prefix block (their whole caption as the key).

Normalization: lower + whitespace-collapse, applied before every pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemophonix_spark import config as C


def _normalized(corpus: DataFrame, id_col: str = "image_id",
                caption_col: str = "caption") -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(F.trim(F.lower(F.col(caption_col))), r"\s+", " ").alias(
            "cap"
        ),
    ).filter(F.length("cap") > 0)


def caption_exact_pairs(corpus: DataFrame) -> DataFrame:
    """(id_a, id_b) with identical normalized captions."""
    capped = _normalized(corpus).withColumn("h", F.md5("cap"))
    a = capped.select(F.col("id").alias("id_a"), "h")
    b = capped.select(F.col("id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def caption_simhash(corpus: DataFrame) -> DataFrame:
    """(id, simhash string(64)) — same construction as dedup_text.simhash64."""
    from mnemophonix_spark.operators.dedup_text import simhash64

    norm = _normalized(corpus)
    return simhash64(norm, id_col="id", text_col="cap")


def caption_simhash_pairs(
    corpus: DataFrame, max_hamming: int = C.SIMHASH_MAX_HAMMING
) -> DataFrame:
    """(id_a, id_b, hamming) for caption SimHash near-dups.

    LSH blocking on 4 16-bit bands (any pair within hamming<=3 shares a
    band by pigeonhole), then exact hamming verification JVM-side.
    """
    sh = caption_simhash(corpus)
    n_bands = 4
    width = C.SIMHASH_BITS // n_bands
    bands = sh.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band_id"),
    ).withColumn("band_key", F.substring("simhash", F.col("band_id") * width + 1, width))
    a = bands.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"),
                     "band_id", "band_key")
    b = bands.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"),
                     "band_id", "band_key")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.split("sh_a", ""),
            F.split("sh_b", ""),
            lambda x, y: F.when(x == y, 0).otherwise(1),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def caption_substring_pairs(corpus: DataFrame, k: int = 5) -> DataFrame:
    """(id_a, id_b) where normalized caption of id_a is a strict
    substring of id_b's (either orientation; output canonical order
    with a ``contained_id`` marker).

    Blocking join on k-word shingles (container side) vs first-k-word
    prefix (containee side); exact containment verified with contains.
    """
    norm = _normalized(corpus)
    words = norm.select(
        "id", "cap", F.split("cap", " ").alias("w")
    )
    containee = words.select(
        F.col("id").alias("id_s"),
        F.col("cap").alias("cap_s"),
        F.when(
            F.size("w") >= k, F.concat_ws(" ", F.slice("w", 1, k))
        ).otherwise(F.col("cap")).alias("key"),
    )
    # container emits every L-word shingle for L in 1..k: a containee
    # with fewer than k words blocks on its whole caption (length < k),
    # so the container must cover those lengths too.  Key fan-out is
    # <= k * n_words per row — the standard variable-q-gram blocking.
    container = (
        words.select(
            F.col("id").alias("id_l"),
            F.col("cap").alias("cap_l"),
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.least(F.size("w"), F.lit(k))),
                        lambda L: F.transform(
                            F.sequence(F.lit(1), F.size("w") - L + 1),
                            lambda i: F.concat_ws(" ", F.slice("w", i, L)),
                        ),
                    )
                )
            ).alias("key"),
        )
        .distinct()
    )
    return (
        containee.join(container, "key")
        .filter(
            (F.col("id_s") != F.col("id_l"))
            & (F.length("cap_s") < F.length("cap_l"))
            # word-aligned containment (space padding): a raw string
            # `contains` would also match mid-word ("one two" inside
            # "xxxone two"), which the word-shingle blocking can never
            # surface — the gate must match the blocking's semantics
            & F.concat(F.lit(" "), F.col("cap_l"), F.lit(" ")).contains(
                F.concat(F.lit(" "), F.col("cap_s"), F.lit(" "))
            )
        )
        .select(
            F.least("id_s", "id_l").alias("id_a"),
            F.greatest("id_s", "id_l").alias("id_b"),
            F.col("id_s").alias("contained_id"),
        )
        .distinct()
    )


def caption_pairs(corpus: DataFrame) -> DataFrame:
    """Union of the three passes: (id_a, id_b, via)."""
    exact = caption_exact_pairs(corpus).withColumn("via", F.lit("exact"))
    sim = caption_simhash_pairs(corpus).select(
        "id_a", "id_b", F.lit("simhash").alias("via")
    )
    sub = caption_substring_pairs(corpus).select(
        "id_a", "id_b", F.lit("substring").alias("via")
    )
    return exact.unionByName(sim).unionByName(sub)

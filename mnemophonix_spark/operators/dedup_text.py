"""Text dedup channel over document tables (training-data pipeline ops).

These operators extend the engine beyond the reference's image chain to
the text side of the image+caption corpus and to generic document
tables: exact dedup, k-shingle MinHash + banded LSH, n-gram Jaccard,
and SimHash — the standard web-scale dedup toolbox.

Cross-engine determinism: all hashes are md5 hex strings (identical in
Spark and DuckDB/ANSI SQL), and MinHash permutations are salted md5s
(``md5(i || ':' || shingle)``) whose lexicographic min equals numeric
min (fixed-length lowercase hex).  Every operator here has an exact
ANSI-SQL twin in ``__spark_entry__.oracle_sql`` — that twin IS the
correctness oracle, so the DataFrame code deliberately stays in
declarative built-ins (no UDFs) that Catalyst compiles to codegen.

Scale notes:
- shingling explodes ~n_words rows per doc; the groupBys below are
  partial-agg friendly (min/count) so map-side combine bounds shuffle.
- banded MinHash candidates use groupBy-on-band + self-pair like the
  image LSH, with the same hot-bucket concern (boilerplate captions!);
  pair emission dedupes band-wise via distinct before counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_ID = "doc_id"
TEXT = "text"


def _words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, word) — lowercase whitespace tokenization, 1-based pos."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "pos0", "word"
        ),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "word")


def shingles(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
             k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document via window lead()."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    words = _words(df, id_col, text_col)
    cols = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, k)]
    return (
        words.select("id", F.concat_ws(" ", *cols).alias("shingle"),
                     *[F.lead("word", i).over(w).alias(f"_w{i}") for i in range(1, k)])
        .filter(F.col(f"_w{k-1}").isNotNull())
        .select("id", "shingle")
        .distinct()
    )


def exact_dedup(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text.

    Output: (text_hash, keep_id, n_copies) — keep_id is the min id.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                       k: int = 3, n_perm: int = 16) -> DataFrame:
    """(id, perm_id, minhash hex-string) — salted-md5 MinHash.

    h_i(shingle) = md5(i || ':' || shingle); signature_i = min over
    shingles.  Text analog of the image chain's frozen-permutation
    MinHash (minhash.c:13-28) with hash-salting replacing the stored
    permutation table (standard for unbounded shingle universes).
    """
    sh = shingles(df, id_col, text_col, k)
    perms = F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("perm_id")
    return (
        sh.select("id", "shingle", perms)
        .select(
            "id",
            "perm_id",
            F.md5(F.concat_ws(":", F.col("perm_id"), F.col("shingle"))).alias("h"),
        )
        .groupBy("id", "perm_id")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_band_pairs(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                       k: int = 3, n_perm: int = 16, rows_per_band: int = 2,
                       min_shared_bands: int = 1) -> DataFrame:
    """Banded-LSH candidate pairs: (id_a, id_b, n_shared_bands).

    Bands of ``rows_per_band`` consecutive minhashes; band key is the
    md5 of the concatenated member hashes (the text twin of the image
    chain's 25x4-byte banding, lsh.c:49-52).
    """
    sig = minhash_signatures(df, id_col, text_col, k, n_perm)
    bands = (
        sig.withColumn("band_id", (F.col("perm_id") / rows_per_band).cast("int"))
        .groupBy("id", "band_id")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", "perm_id", "minhash"))))).alias("band_hash"))
    )
    a = bands.select(F.col("id").alias("id_a"), "band_id", "band_hash")
    b = bands.select(F.col("id").alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_shared_bands)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                        k: int = 3, min_jaccard: float = 0.4) -> DataFrame:
    """Exact k-shingle Jaccard for all pairs sharing >=1 shingle.

    Output: (id_a, id_b, n_common, jaccard rounded to 6dp).  The
    shared-shingle join prunes the quadratic pair space to pairs with
    nonzero intersection — the exact-verification twin of the banded
    candidates at small k.
    """
    sh = shingles(df, id_col, text_col, k)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT) -> DataFrame:
    """64-bit SimHash over words as a '0'/'1' bit string (bit 0 first).

    bit b of word w = bit b of the first 16 hex chars of md5(w); the
    simhash bit is the sign of sum(2*bit - 1) over the word multiset.
    Output: (id, simhash string(64)).  Kept in explode form (id x word
    x 64 bits) so the DuckDB twin is expression-identical; a packed
    vectorized variant can replace it if profiling demands.
    """
    words = _words(df, id_col, text_col).select("id", "word")
    bits = words.select(
        "id",
        "word",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
    ).withColumn(
        "nibble",
        F.conv(F.substring(F.md5(F.col("word")), (F.col("b") / 4 + 1).cast("int"), 1),
               16, 10).cast("int"),
    ).withColumn(
        "bit",
        F.floor(F.col("nibble") / F.pow(F.lit(2), 3 - F.col("b") % 4)).cast("int") % 2,
    )
    return (
        bits.groupBy("id", "b")
        .agg(F.sum(F.col("bit") * 2 - 1).alias("s"))
        .withColumn("c", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")))
        .groupBy("id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "c"))),
                    lambda x: x["c"],
                ),
            ).alias("simhash")
        )
    )

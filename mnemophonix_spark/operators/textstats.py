"""Text analysis operators for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring, token
counting, and document fingerprinting (min-hash-of-shingles content
fingerprint).  All pure column expressions (whole-stage codegen; no
UDFs) with exact ANSI-SQL twins in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small embedded english stopword list; deterministic, shared with SQL twin
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that",
]


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, punct_ratio) per document.

    Token = maximal run of non-whitespace (whitespace regex split);
    punct_ratio = non-alphanumeric-non-space chars / total chars.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    tokens = F.split(F.trim(t), r"\s+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(tokens))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(
            (n_chars - n_space) / F.when(n_tokens == 0, 1).otherwise(n_tokens), 6
        ).alias("avg_token_len"),
        F.round(n_punct / F.when(n_chars == 0, 1).otherwise(n_chars), 6).alias(
            "punct_ratio"
        ),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + low punctuation +
    stopword presence.  (id, stopword_ratio, quality)."""
    stats = token_stats(df, id_col, text_col)
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    sw = (
        words.groupBy("id")
        .agg(
            F.round(
                F.sum(F.when(F.col("word").isin(EN_STOPWORDS), 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("stopword_ratio")
        )
    )
    out = stats.join(sw, "id", "left").fillna({"stopword_ratio": 0.0})
    len_ok = (F.col("n_chars") >= 50) & (F.col("n_chars") <= 5000)
    punct_ok = F.col("punct_ratio") <= 0.2
    sw_ok = F.col("stopword_ratio") >= 0.05
    return out.select(
        "id",
        "stopword_ratio",
        F.round(
            (
                F.when(len_ok, 0.4).otherwise(0.0)
                + F.when(punct_ok, 0.3).otherwise(0.0)
                + F.when(sw_ok, 0.3).otherwise(0.0)
            ),
            2,
        ).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language id: 'en' when stopword_ratio >= 0.05 and the
    text is >=80% ascii-alpha/space, else 'other'.  (id, lang_pred)."""
    q = quality_score(df, id_col, text_col)
    t = F.col(text_col)
    ascii_ratio = F.length(F.regexp_replace(t, r"[^A-Za-z\s]", "")) / F.when(
        F.length(t) == 0, 1
    ).otherwise(F.length(t))
    base = df.select(
        F.col(id_col).alias("id"), F.round(ascii_ratio, 6).alias("ascii_ratio")
    )
    return base.join(q.select("id", "stopword_ratio"), "id").select(
        "id",
        F.when(
            (F.col("stopword_ratio") >= 0.05) & (F.col("ascii_ratio") >= 0.8),
            F.lit("en"),
        )
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 5) -> DataFrame:
    """Content fingerprint: min md5 over k-word shingles (winnowing-lite).

    Two documents sharing a fingerprint almost surely share a k-run of
    words; used as a cheap near-dup blocking key.  (id, fingerprint).
    """
    from mnemophonix_spark.operators.dedup_text import shingles

    sh = shingles(df, id_col, text_col, k)
    return sh.groupBy("id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))

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


def bpe_ish_tokens(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: alpha runs, digit runs, and single
    punctuation marks each count as one token (the pre-tokenization
    regex most BPE vocabularies apply).  (id, n_bpe_tokens)."""
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        window: int = 4) -> DataFrame:
    """Winnowing-style document fingerprints (after Schleimer/
    Wilkerson/Aiken's MOSS scheme): hash every k-word shingle and keep
    each position whose hash is the minimum of the forward window of
    ``window`` consecutive hashes.

    Selection is purely local (depends only on h[p..p+window-1]), so
    two documents sharing a word run long enough to cover a selected
    window select the same fingerprint — the blocking property that
    makes winnowed fps a near-dup key.  The hash is md5 (cross-engine
    determinism) instead of a literal polynomial rolling hash; the
    canonical rightmost-min-per-window rule is swapped for the simpler
    forward-window-min (documented deviation; same flavor, exact SQL
    twin).  Output: (id, fp) distinct.
    """
    from pyspark.sql.window import Window

    w = F.split(F.lower(F.col(text_col)), r"\s+")
    n_sh = F.size(w) - (k - 1)
    sh = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = df.select(
        F.col(id_col).alias("id"), F.posexplode(sh).alias("pos", "shingle")
    ).select("id", "pos", F.md5("shingle").alias("h"))
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    return (
        hashed.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("h") == F.col("wmin"))
        .select("id", F.col("h").alias("fp"))
        .distinct()
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


def unigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_logprob): mean natural-log unigram probability
    of each document under the corpus's OWN word distribution — the
    count-based ancestor of LM-perplexity quality filtering (a CCNet-
    style signal): rare-token/gibberish documents score low, common
    vocabulary scores high.  avg_logprob = mean over token occurrences
    of ln(corpus_count(word) / corpus_total_tokens), rounded to 6dp
    (ulp differences between engines' ln implementations are far below
    the rounding).

    Scale shape: one exploded word table feeds BOTH the frequency agg
    and the per-doc join; the frequency table is vocabulary-sized
    (broadcastable), the total is a 1-row broadcast cross join, and the
    per-doc mean is a partial-agg groupBy — no all-pairs anything.
    """
    from mnemophonix_spark.operators.dedup_text import _words

    words = _words(df, id_col, text_col).select("id", "word")
    freq = words.groupBy("word").agg(F.count("*").alias("word_count"))
    total = freq.agg(F.sum("word_count").alias("total_tokens"))
    return (
        words.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            (F.log(F.col("word_count") / F.col("total_tokens"))).alias("lp"),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )

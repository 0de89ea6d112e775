"""Cross-modality channel: link image captions to document texts.

The corpus schema carries text on both modalities (``caption`` on image
rows, ``text`` on document rows); a training-data pipeline wants them
joined — e.g. to propagate document-level quality/lang labels onto
images, or to dedup an image whose caption is lifted from a crawled
page.  The reference has no cross-modality counterpart (it is
single-domain); this operator is a north-star extension named in the
round-2 review's next-round list (VERDICT.md r2 §Missing 4).

``caption_doc_links`` links every image to its best-matching document
by shared-distinct-word count — the same bag-of-words overlap primitive
the Jaccard channel uses, reduced to top-1 per image with deterministic
ties (min doc_id).  Pure column expressions end to end, so the driver
holds an exact DuckDB twin.

Scale notes (100 TB shape):
- both word tables are (id, word) DISTINCT projections — partial-agg
  friendly, no payload columns ever shuffle;
- the join key is a word: hot stop-words would fan out quadratically,
  so the document side takes the same document-frequency cap the
  Jaccard channel applies to stop-shingles (``max_word_df``, inert at
  test scale, bounds per-word fan-out at web scale);
- top-1 is a window over each image's matched docs only (bounded by
  the df cap), never a corpus-wide sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def caption_doc_links(
    corpus: DataFrame,
    documents: DataFrame,
    max_word_df: int = 100_000,
    id_col: str = "image_id",
    caption_col: str = "caption",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(image_id, doc_id, n_shared_words): for each image whose caption
    shares at least one word with some document, the document sharing
    the most distinct words (ties -> lowest doc_id).

    Caption normalization matches the caption channel exactly
    (captions._normalized: lower + trim + whitespace-collapse); document
    tokenization matches the text channel (lower + split on \\s+).
    """
    from mnemophonix_spark.operators.captions import _normalized

    # empty tokens are filtered on BOTH sides: an empty/whitespace-only
    # caption normalizes to '' and would otherwise equi-join the ''
    # tokens that documents with leading/trailing whitespace emit,
    # linking unrelated rows on a zero-content key (round-3 advice)
    cap_words = (
        _normalized(corpus, id_col=id_col, caption_col=caption_col)
        .select(
            F.col("id").alias("image_id"),
            F.explode(F.split("cap", " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    doc_words = (
        documents.select(
            F.col(doc_id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    # stop-word cap on the JOIN side only (same recipe as the Jaccard
    # channel's stop-shingles): a word carried by more than max_word_df
    # documents is boilerplate and would fan the join out by that df per
    # caption occurrence; inert below the cap so the SQL twin is exact
    wdf = doc_words.groupBy("word").agg(F.count("*").alias("df_count"))
    joinable = doc_words.join(
        wdf.filter(F.col("df_count") <= max_word_df).select("word"), "word"
    )
    common = (
        cap_words.join(joinable, "word")
        .groupBy("image_id", "doc_id")
        .agg(F.count("*").alias("n_shared_words"))
    )
    w = Window.partitionBy("image_id").orderBy(
        F.desc("n_shared_words"), F.asc("doc_id")
    )
    return (
        common.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("image_id", "doc_id", "n_shared_words")
    )

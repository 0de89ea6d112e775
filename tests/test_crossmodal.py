"""Cross-modality caption<->document linking."""

from __future__ import annotations

from mnemophonix_spark.operators import crossmodal


def _links(spark, corpus_rows, doc_rows, **kw):
    corpus = spark.createDataFrame(corpus_rows, "image_id string, caption string")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    return {
        r["image_id"]: (r["doc_id"], r["n_shared_words"])
        for r in crossmodal.caption_doc_links(corpus, docs, **kw).collect()
    }


def test_top1_by_shared_words_with_deterministic_ties(spark):
    out = _links(
        spark,
        [
            ("i1", "alpha beta gamma"),
            ("i2", "zeta eta theta"),
            ("i3", "nomatch tokens only"),
            ("i4", "  Alpha   BETA  "),  # normalization: lower + collapse
        ],
        [
            (1, "alpha beta something"),
            (2, "alpha beta gamma extra"),
            (3, "zeta eta"),
            (4, "zeta eta"),  # exact tie with doc 3 -> min doc_id wins
        ],
    )
    assert out["i1"] == (2, 3)
    assert out["i2"] == (3, 2)
    assert "i3" not in out
    assert out["i4"] == (1, 2) or out["i4"] == (2, 2)
    # doc 1 and doc 2 both share {alpha, beta} with i4 -> tie -> doc 1
    assert out["i4"] == (1, 2)


def test_word_multiplicity_does_not_count(spark):
    """Shared-word count is over DISTINCT words on both sides."""
    out = _links(
        spark,
        [("i1", "alpha alpha alpha beta")],
        [(1, "alpha"), (2, "alpha alpha beta beta")],
    )
    assert out["i1"] == (2, 2)


def test_stopword_df_cap_drops_boilerplate_only_links(spark):
    """A word present in more documents than the cap cannot link; rarer
    words still do (the Jaccard-channel stop-shingle recipe)."""
    docs = [(i, "the common boilerplate") for i in range(5)] + [(99, "rare gem")]
    out = _links(
        spark,
        [("i1", "the rare gem"), ("i2", "the common words")],
        docs,
        max_word_df=3,
    )
    # 'the'/'common'/'boilerplate' have df 5 > 3 -> capped out
    assert out["i1"] == (99, 2)
    assert "i2" not in out


def test_mass_duplicate_captions_stay_bounded(spark):
    """Pathology guard: thousands of identical captions against a
    boilerplate-heavy document table must not explode the word join —
    with the df cap active the candidate set is exactly rare-word
    links, and the top-1 window bounds output to one row per image."""
    from pyspark.sql import functions as F

    corpus = spark.range(0, 3000).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.lit("the common boilerplate caption with rare gem words").alias(
            "caption"
        ),
    )
    docs = spark.createDataFrame(
        [(i, "the common boilerplate caption with words") for i in range(50)]
        + [(99, "rare gem")],
        "doc_id long, text string",
    )
    out = crossmodal.caption_doc_links(corpus, docs, max_word_df=10)
    rows = out.collect()
    # every image links, exactly once, to the only document carrying
    # the sub-cap words ('rare', 'gem': df 1 <= 10; all others df 51)
    assert len(rows) == 3000
    assert {(r["doc_id"], r["n_shared_words"]) for r in rows} == {(99, 2)}

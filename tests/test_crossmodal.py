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

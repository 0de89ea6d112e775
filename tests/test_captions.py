"""Caption channel: must catch planted kind-5 (identical caption) and
kind-6 (substring) pairs and not pair unrelated captions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mnemophonix_spark.operators import captions


@pytest.fixture(scope="module")
def corpus_df(spark):
    # the 300-row corpus plants kind-5 AND kind-6 pairs (the 150-row
    # pytest corpus happens to draw no kind-5 — assertions would be
    # vacuous there)
    from mnemophonix_spark import corpusgen

    d = corpusgen.ensure_corpus("/root/repo/.cache", 300)
    return spark.read.parquet(f"{d}/corpus")


@pytest.fixture(scope="module")
def truth300():
    import pyarrow.parquet as pq

    from mnemophonix_spark import corpusgen

    d = corpusgen.ensure_corpus("/root/repo/.cache", 300)
    return pq.read_table(f"{d}/truth_pairs.parquet").to_pylist()


def test_exact_caption_pairs_catch_kind5(corpus_df, truth300):
    kind5 = {(p["id_a"], p["id_b"]) for p in truth300 if p["kind"] == 5}
    assert kind5, "fixture must plant kind-5 pairs"
    got = {(r["id_a"], r["id_b"]) for r in captions.caption_exact_pairs(corpus_df).collect()}
    assert kind5 <= got


def test_substring_pairs_catch_kind6(corpus_df, truth300):
    kind6 = {(p["id_a"], p["id_b"]) for p in truth300 if p["kind"] == 6}
    assert kind6, "fixture must plant kind-6 pairs"
    res = captions.caption_substring_pairs(corpus_df).collect()
    got = {(r["id_a"], r["id_b"]) for r in res}
    assert kind6 <= got
    # the contained side of a kind-6 pair is the base caption (id_a)
    contained = {(r["id_a"], r["id_b"]): r["contained_id"] for r in res}
    for a, b in kind6:
        assert contained[(a, b)] == a


def test_simhash_pairs_catch_kind5_and_no_random_pairs(corpus_df, truth300):
    kind5 = {(p["id_a"], p["id_b"]) for p in truth300 if p["kind"] == 5}
    assert kind5
    got = {(r["id_a"], r["id_b"]) for r in captions.caption_simhash_pairs(corpus_df).collect()}
    assert kind5 <= got  # hamming 0 for identical captions
    # captions are 5-20 random words from 512: non-dup captions must not
    # collide within hamming<=3 (sanity bound, not a hard guarantee)
    image_kinds = {(p["id_a"], p["id_b"]) for p in truth300}
    false = got - image_kinds
    assert len(false) <= 2, f"unexpected simhash pairs: {false}"


def test_caption_pairs_union_tags(corpus_df):
    via = {r["via"] for r in captions.caption_pairs(corpus_df).select("via").distinct().collect()}
    assert via <= {"exact", "simhash", "substring"}


def test_substring_short_caption_fallback(spark):
    df = spark.createDataFrame(
        [
            ("a", "one two"),                      # 2 words, < k
            ("b", "zz one two yy"),                # contains a
            ("c", "unrelated caption here now ok"),
        ],
        "image_id string, caption string",
    )
    got = {(r["id_a"], r["id_b"]) for r in
           captions.caption_substring_pairs(df, k=5).collect()}
    assert ("a", "b") in got
    assert not any("c" in p for p in got)


def test_suffix_array_construction():
    """The NumPy prefix-doubling suffix array must equal the naive
    sorted-suffixes construction."""
    from mnemophonix_spark.operators.captions import _suffix_array

    for text in ("banana\x00", "abracadabra \x00x", " a b a b \x00 a b ",
                 "zzzz", "a"):
        sa, _tb = _suffix_array(text)
        b = text.encode()
        naive = sorted(range(len(b)), key=lambda i: b[i:])
        assert sa.tolist() == naive, text


def test_substring_sa_matches_blocking_variant(spark, corpus_df):
    """The suffix-array pass must produce exactly the q-gram blocking
    pass's pairs on the 300-row corpus (identical semantics)."""
    from mnemophonix_spark.operators import captions as cap

    base = {
        (r["id_a"], r["id_b"], r["contained_id"])
        for r in cap.caption_substring_pairs(corpus_df).collect()
    }
    sa = {
        (r["id_a"], r["id_b"], r["contained_id"])
        for r in cap.caption_substring_pairs_sa(corpus_df).collect()
    }
    assert sa == base
    assert base, "corpus must plant at least one substring pair"


def test_substring_sa_handcrafted(spark):
    """Hand-built corner cases: word-aligned only, strict containment,
    short-caption whole-key block, no self pairs."""
    from mnemophonix_spark.operators import captions as cap

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "quick brown fox jumps over"),   # 5-word containee
        ("c", "brown fox"),                    # short containee (<k words)
        ("d", "xxxbrown fox"),                 # NOT word-aligned container of c
        ("e", "the quick brown fox jumps over the lazy dog"),  # equal to a: not strict
        ("f", "unrelated caption entirely"),
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = {
        (r["id_a"], r["id_b"], r["contained_id"])
        for r in cap.caption_substring_pairs_sa(df).collect()
    }
    expected_blocking = {
        (r["id_a"], r["id_b"], r["contained_id"])
        for r in cap.caption_substring_pairs(df).collect()
    }
    assert got == expected_blocking
    assert ("a", "b", "b") in got
    assert ("b", "e", "b") in got
    assert ("a", "c", "c") in got and ("c", "e", "c") in got
    assert ("b", "c", "c") in got
    assert not any("d" in p[:2] and p[2] == "c" for p in got)  # not aligned
    assert not any(p[0] == "a" and p[1] == "e" for p in got)   # equal: not strict

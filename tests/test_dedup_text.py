"""Text-dedup corner cases the random documents table can't pin:
numeric cluster labelling across id-width boundaries, and salting
inertness below the bucket cap.  The sf0.01 DuckDB twins in
__spark_entry__ remain the value-level gate."""

from __future__ import annotations

from mnemophonix_spark.operators import dedup_text


def test_dup_clusters_numeric_min_label(spark):
    """ids 9 and 10 share a text: the cluster label must be numeric
    min 9 — a raw string CC would pick "10" < "9" lexicographically."""
    text = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(9, text), (10, text), (700, "an entirely different sentence "
                                      "about nothing shared at all here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_text.dup_clusters(docs).collect()}
    assert out == {9: 9, 10: 9, 700: 700}


def test_dup_clusters_short_docs_are_singletons(spark):
    """Docs with fewer than k words have no shingles, join no pairs,
    and must still appear labelled by themselves."""
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "also tiny"), (3, "a b c d e f g")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_text.dup_clusters(docs).collect()}
    assert out == {1: 1, 2: 2, 3: 3}


def test_minhash_band_pairs_salt_inert_below_cap(spark):
    """Below the hot-bucket cap every salt is 0, so salting must not
    change the pair set (this is what keeps the SQL twin exact)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, base) for i in range(6)] + [(99, "unrelated words only here "
                                              "nothing in common with others")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_text.minhash_band_pairs(docs).collect()
    }
    # 6 identical docs -> all 15 canonical pairs, the outlier in none
    assert pairs == {(a, b) for a in range(6) for b in range(6) if a < b}


def test_winnow_pairs_containment(spark):
    """Winnowing is a containment detector: a paragraph pasted into a
    much longer document must surface even though global Jaccard is
    tiny (the shingle-Jaccard channel misses it by design)."""
    from mnemophonix_spark.operators import dedup_text as dt

    para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, para), (2, filler + " " + para + " " + filler.replace("w", "v")),
         (3, "totally unrelated text with many different words here")],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]) for r in dt.winnow_pairs(docs, min_shared=1).collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)
    jac = {(r["id_a"], r["id_b"])
           for r in dt.ngram_jaccard_pairs(docs, min_jaccard=0.4).collect()}
    assert (1, 2) not in jac  # the case Jaccard misses


def test_simhash_pairs_small_edit(spark):
    """SimHash bands catch a one-word edit of a 60-word document; an
    unrelated document stays out."""
    from mnemophonix_spark.operators import dedup_text as dt

    base = " ".join(f"word{i}" for i in range(60))
    edited = base.replace("word30", "changed")
    docs = spark.createDataFrame(
        [(1, base), (2, edited),
         (3, " ".join(f"other{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dt.simhash_pairs(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert not any(3 in p for p in got)


def test_fused_doc_clusters_union_dominates_channels(spark):
    """The fused assignment must merge pairs any single channel finds:
    a containment pair (winnow-only) and a small-edit pair (simhash)
    end up in one cluster with the Jaccard-connected docs."""
    from mnemophonix_spark.operators import dedup_text as dt

    base = " ".join(f"word{i}" for i in range(60))
    edited = base.replace("word30", "changed")          # simhash pair w/ 1
    para = " ".join(f"word{i}" for i in range(30))       # contained in 1
    filler = " ".join(f"x{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, filler + " " + para + " " + filler),
         (4, "totally different text that matches nothing else at all")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dt.fused_doc_clusters(docs).collect()}
    assert got[1] == got[2] == got[3] == 1  # numeric min label
    assert got[4] == 4


def test_simhash64_fast_parity(spark):
    """The packed Arrow simhash must be row-identical to the explode /
    SQL-oracle formulation on real documents AND on tokenization edge
    cases (leading/trailing whitespace, repeated words, single word)."""
    from mnemophonix_spark.operators import dedup_text as dt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    slow = {r["id"]: r["simhash"] for r in dt.simhash64(docs).collect()}
    fast = {r["id"]: r["simhash"] for r in dt.simhash64_fast(docs).collect()}
    assert fast == slow and len(fast) > 0

    edge = spark.createDataFrame(
        [
            (1, "  leading whitespace"),
            (2, "trailing whitespace  "),
            (3, "word word word word repeated multiset"),
            (4, "single"),
            (5, "MiXeD Case TOKENS mixed case tokens"),
            (6, "tabs\tand\nnewlines   collapse"),
            # Unicode hazards (round-3 advice): U+00A0 / U+2028 are
            # whitespace to Python's re but NOT to Java's \s — they must
            # stay inside tokens; U+0130 exercises locale case folding.
            (7, "nbsp joined and linesep tokens"),
            (8, "İstanbul STRASSE straße İSTANBUL"),
        ],
        "doc_id long, text string",
    )
    slow_e = {r["id"]: r["simhash"] for r in dt.simhash64(edge).collect()}
    fast_e = {r["id"]: r["simhash"] for r in dt.simhash64_fast(edge).collect()}
    assert fast_e == slow_e


def test_minhash_packed_parity(spark):
    """The packed one-pass minhash band table (engine default for
    doc_minhash_band_pairs) must be row-identical to the explode /
    SQL-oracle formulation: full 128-bit digest minima, band md5s, and
    the resulting pair table."""
    from mnemophonix_spark.operators import dedup_text as dt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def _key(rows):
        return sorted((r["id"], r["band_id"], r["band_hash"]) for r in rows)

    sig = dt.minhash_signatures(docs)
    from pyspark.sql import functions as F
    slow_bands = (
        sig.withColumn("band_id", (F.col("perm_id") / 2).cast("int"))
        .groupBy("id", "band_id")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", "perm_id", "minhash"))))).alias("band_hash"))
    )
    fast_bands = dt.minhash_bands_packed(docs)
    assert _key(fast_bands.collect()) == _key(slow_bands.collect())
    assert fast_bands.count() > 0

    slow_pairs = sorted(
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in dt.minhash_band_pairs(docs).collect()
    )
    fast_pairs = sorted(
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in dt.minhash_band_pairs_fast(docs).collect()
    )
    assert fast_pairs == slow_pairs and len(fast_pairs) > 0

    edge = spark.createDataFrame(
        [
            (1, "  leading whitespace"),
            (2, ""),                       # empty doc: no shingles
            (3, "two words"),              # below shingle size k=3
            (4, "exactly three word tokens here"),
            (5, "exactly three word tokens here"),  # exact dup of 4
            (6, "nbsp joined and linesep tokens trailing  "),
            (7, "İstanbul STRASSE straße three word shingle parity"),
        ],
        "doc_id long, text string",
    )
    sig_e = dt.minhash_signatures(edge)
    slow_e = (
        sig_e.withColumn("band_id", (F.col("perm_id") / 2).cast("int"))
        .groupBy("id", "band_id")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", "perm_id", "minhash"))))).alias("band_hash"))
    )
    assert _key(dt.minhash_bands_packed(edge).collect()) == _key(slow_e.collect())


def test_simhash_engine_dispatch(spark, monkeypatch):
    """simhash_pairs must follow the config flag: packed by default,
    explode when SPARK_GRAFT_SIMHASH_IMPL=explode — identical results."""
    from mnemophonix_spark import config as C
    from mnemophonix_spark.operators import dedup_text as dt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = set(map(tuple, dt.simhash_pairs(docs).collect()))
    monkeypatch.setattr(C, "SIMHASH_IMPL", "explode")
    explode = set(map(tuple, dt.simhash_pairs(docs).collect()))
    assert packed == explode

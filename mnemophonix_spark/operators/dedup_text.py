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

from mnemophonix_spark import config as C

DOC_ID = "doc_id"
TEXT = "text"


def _fanout_rebalance(df: DataFrame) -> DataFrame:
    """Spread rows across the cluster before a heavy per-row fan-out.

    Shingling explodes ~n_words x n_perm rows per doc; if the scan has
    fewer splits than cores (small files, or one coalesced split), all
    of that CPU lands on a handful of tasks.  Repartitioning the
    pre-explode rows is nearly free (docs are small), so rebalance
    whenever the scan is narrower than the default parallelism.  At
    real scale the scan has thousands of splits and this is a no-op.

    The width probe uses the scan's FILE INDEX (``inputFiles``), not
    ``df.rdd`` — converting to an RDD forces plan analysis on the
    driver for every call.  Non-file frames (in-memory test data)
    return no files and are left alone: they already inherit the
    default parallelism.  ``config.FANOUT_REBALANCE`` can force
    ("always") or disable ("off") the behavior.
    """
    mode = C.FANOUT_REBALANCE
    if mode == "off":
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if mode == "always":
        return df.repartition(target)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


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
    """Distinct k-word shingles per document.

    Built with array expressions (split -> slice -> explode), which is
    shuffle-free until the final distinct — a window-lead formulation
    would shuffle the exploded word table first.  Semantically equal to
    the SQL twin's lead() form (same shingle sets).
    """
    w = F.split(F.lower(F.col(text_col)), r"\s+")
    n_sh = F.size(w) - (k - 1)
    sh = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _fanout_rebalance(df)
        .select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
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

    Plan note: this deliberately stays in explode -> groupBy form.  A
    fully row-local nested-array-transform formulation (array_min over
    transform(shingles, md5)) computes the same minima with zero
    shuffles but runs ~4x slower end-to-end: Spark evaluates
    higher-order-function lambdas interpreted, outside whole-stage
    codegen, so 16 md5s per shingle dominate.  The exploded md5 +
    partial-agg min is codegen'd, and map-side combine collapses the
    shuffle to n_docs * n_perm rows.
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
    return _band_pair_join(bands, min_shared_bands)


def minhash_bands_packed(df: DataFrame, id_col: str = DOC_ID,
                         text_col: str = TEXT, k: int = 3, n_perm: int = 16,
                         rows_per_band: int = 2) -> DataFrame:
    """Packed vectorized twin of the explode-minhash band table: same
    (id, band_id, band_hash) rows, computed in ONE Arrow pass per doc
    instead of the id x shingle x perm explode (see
    ``minhash_band_pairs_fast`` for the measured default decision).

    Shingle ARRAYS are built JVM-side — identical split/lower/slice semantics
    as ``shingles`` (the simhash round-3 tokenization-parity lesson) —
    and the UDF hashes the batch's unique (doc-distinct) shingle set
    once per permutation, takes exact 128-bit lexicographic minima via
    one lexsort per permutation (full-digest comparison: hex-string
    order == big-endian digest order), and emits the band md5s
    directly.  Parity with ``minhash_band_pairs``'s band table is
    pinned by tests/test_dedup_text.py::test_minhash_packed_parity.
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bands_udf(shingle_arrays):
        import hashlib

        import numpy as np
        import pandas as pd

        md5 = hashlib.md5
        ndocs = len(shingle_arrays)
        if not ndocs:
            return pd.Series([], dtype="object")
        docs = []
        for arr in shingle_arrays:
            if arr is None or len(arr) == 0:
                docs.append(np.asarray([], dtype=object))
            else:
                # per-doc distinct, matching shingles()'s .distinct()
                docs.append(np.unique(np.asarray(arr, dtype=object)))
        lens = np.array([d.size for d in docs], dtype=np.int64)
        flat = np.concatenate(docs) if ndocs else np.asarray([], dtype=object)
        out = [None] * ndocs
        if flat.size == 0:
            return pd.Series(out, dtype="object")
        uniq, inv = np.unique(flat, return_inverse=True)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
        has = lens > 0
        starts = np.nonzero(
            np.diff(np.concatenate([[-1], doc_of])) > 0
        )[0]  # first flat index of each non-empty doc, in doc order
        # ceil, matching the explode path's band_id = perm_id // rows_per_band
        # which emits a trailing PARTIAL band when rows_per_band does not
        # divide n_perm (round-4 advisory: floor dropped it for e.g.
        # n_perm=16, rows_per_band=3)
        n_bands = -(-n_perm // rows_per_band)
        # per-perm minima as full hex strings, [n_perm][n_nonempty_docs]
        mins_hex: list[list[str]] = []
        for p in range(n_perm):
            salt = (str(p) + ":").encode("utf-8")
            digests = b"".join(
                md5(salt + s.encode("utf-8")).digest() for s in uniq
            )
            dig = np.frombuffer(digests, dtype=np.uint8).reshape(uniq.size, 16)
            hi = dig[:, :8].copy().view(">u8").ravel()[inv]
            lo = dig[:, 8:].copy().view(">u8").ravel()[inv]
            # sort by (doc, hi, lo): first row per doc = exact 128-bit min
            order = np.lexsort((lo, hi, doc_of))
            min_rows = order[starts]
            row_digests = dig[inv[min_rows]]
            mins_hex.append([r.tobytes().hex() for r in row_digests])
        band_lists: dict[int, list[str]] = {}
        for di, flat_doc in enumerate(np.nonzero(has)[0]):
            bands = []
            for b in range(n_bands):
                parts = [
                    f"{p}:{mins_hex[p][di]}"
                    for p in range(b * rows_per_band,
                                   min((b + 1) * rows_per_band, n_perm))
                ]
                # JVM array_sort on 'perm:hex' strings: within a band
                # the perm ids share digit count, so string order ==
                # numeric order and sorted() reproduces it
                bands.append(md5("|".join(sorted(parts)).encode()).hexdigest())
            out[int(flat_doc)] = bands
        return pd.Series(out, dtype="object")

    w = F.split(F.lower(F.col(text_col)), r"\s+")
    n_sh = F.size(w) - (k - 1)
    sh_arr = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    packed = (
        _fanout_rebalance(df)
        .select(F.col(id_col).alias("id"), bands_udf(sh_arr).alias("bands"))
        .filter(F.col("bands").isNotNull())
    )
    return packed.select(
        "id", F.posexplode("bands").alias("band_id", "band_hash")
    )


def minhash_band_pairs_fast(df: DataFrame, id_col: str = DOC_ID,
                            text_col: str = TEXT, k: int = 3,
                            n_perm: int = 16, rows_per_band: int = 2,
                            min_shared_bands: int = 1) -> DataFrame:
    """Banded-minhash pairs via the packed band table; same output as
    ``minhash_band_pairs``, same salted pair join.

    NOT the engine default: measured 0.72x the explode at sf0.1
    (bench `minhash_paths`) — n_perm=16 salted md5s are codegen'd
    JVM-side and the partial-agg min combines map-side, so the explode
    has none of the amplification that made the packed simhash 5-8x.
    Kept as the measured alternative (and the shape to reach for if a
    deployment's Python workers outpace its JVM md5 throughput, e.g.
    larger n_perm with heavy cross-doc shingle reuse)."""
    bands = minhash_bands_packed(df, id_col, text_col, k, n_perm,
                                 rows_per_band)
    return _band_pair_join(bands, min_shared_bands)


def _band_pair_join(bands: DataFrame, min_shared_bands: int) -> DataFrame:
    """(id, band_id, band_hash) -> (id_a, id_b, n_shared_bands).

    Shared tail of the explode and packed minhash paths.
    """
    # hot-band salting (boilerplate captions / template docs put many
    # ids on one band key; the raw self-join would square that).  Same
    # recipe as the image side (lsh.candidate_pairs): salt into
    # ceil(size/cap) groups, pair within groups.  Inactive (salt=0)
    # below the cap, so small-scale results — and the SQL twin — are
    # unchanged.
    cap = C.MAX_BUCKET_SIZE
    # bucket size via window, not a groupBy+self-join: the join form
    # recomputes the whole shingle->minhash chain for the sizes side,
    # doubling the expensive stage; the window shuffles the band table
    # once on its own key and counts in place (buckets are small by
    # construction, so the per-partition sort is cheap)
    from pyspark.sql.window import Window

    wsz = Window.partitionBy("band_id", "band_hash")
    salted = bands.withColumn("bucket_size", F.count("*").over(wsz)).withColumn(
        "salt",
        F.when(F.col("bucket_size") <= cap, F.lit(0)).otherwise(
            # salt keyed PER BAND (band_id in the hash): a per-id-only
            # salt would repeat the same partition in every hot band,
            # permanently separating some true pairs (see the image
            # side's lsh.candidate_pairs for the measured failure)
            F.pmod(
                F.xxhash64(F.col("band_id"), F.col("id").cast("string")),
                F.ceil(F.col("bucket_size") / cap),
            )
        ),
    )
    a = salted.select(F.col("id").alias("id_a"), "band_id", "band_hash", "salt")
    b = salted.select(F.col("id").alias("id_b"), "band_id", "band_hash", "salt")
    return (
        a.join(b, ["band_id", "band_hash", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_shared_bands)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                        k: int = 3, min_jaccard: float = 0.4,
                        max_shingle_df: int = 100_000) -> DataFrame:
    """Exact k-shingle Jaccard for all pairs sharing >=1 shingle.

    Output: (id_a, id_b, n_common, jaccard rounded to 6dp).  The
    shared-shingle join prunes the quadratic pair space to pairs with
    nonzero intersection — the exact-verification twin of the banded
    candidates at small k.

    ``max_shingle_df``: stop-shingles (document frequency above the
    cap, e.g. boilerplate) are excluded from the JOIN side only — they
    still count in per-doc sizes, so a pair whose entire overlap is
    boilerplate drops out rather than exploding the join.  At web scale
    this bounds the join fan-out per shingle; at test scale (doc count
    << cap) it is inert, keeping the SQL twin exact.
    """
    sh = shingles(df, id_col, text_col, k)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    sh_df = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    joinable = sh.join(
        sh_df.filter(F.col("df_count") <= max_shingle_df).select("shingle"),
        "shingle",
    )
    a = joinable.select(F.col("id").alias("id_a"), "shingle")
    b = joinable.select(F.col("id").alias("id_b"), "shingle")
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
    Output: (id, simhash string(64)).  This is the ORACLE formulation,
    kept in explode form (id x word x 64 bits) so the DuckDB twin is
    expression-identical; the engine default is the packed Arrow twin
    ``simhash64_fast`` (same recipe as hyperplane_lsh_buckets_fast),
    parity-pinned by pytest — see ``simhash64_engine``.
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


def simhash64_fast(df: DataFrame, id_col: str = DOC_ID,
                   text_col: str = TEXT) -> DataFrame:
    """Packed vectorized twin of ``simhash64``: same (id, simhash)
    output, computed in ONE Arrow batch pass per row instead of the
    id x word x 64-bit explode.

    The explode formulation shuffles 64 rows per word occurrence —
    3-4 orders of magnitude of shuffle amplification on web documents
    (the engine's biggest remaining shuffle amplifier per the round-2
    review).  Tokenization (split on '\\s+' + lower) happens JVM-SIDE,
    so the word boundaries and case folding are the oracle's own Java
    semantics by construction — Python's Unicode-aware re.split/lower
    diverged on U+00A0-class whitespace and locale case chars (round-3
    advice).  The UDF then hashes the BATCH's unique-word set once
    (md5 digests joined and reinterpreted as big-endian uint64 — the
    int-of-first-16-hex-chars value — with a worker-global cross-batch
    cache), unpacks bits with one NumPy shift, and reduces each doc's
    word multiset with a single segmented reduceat — zero shuffles
    before the one-row-per-doc result.  Parity with the explode oracle
    is pinned by tests/test_dedup_text.py::test_simhash64_fast_parity
    (including a Unicode whitespace/case document).
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def simhash_udf(word_arrays):
        import hashlib

        import numpy as np
        import pandas as pd

        ndocs = len(word_arrays)
        if not ndocs:
            return pd.Series([], dtype="object")
        shifts = (63 - np.arange(64)).astype(np.uint64)
        docs = [
            np.asarray(w if w is not None else [""], dtype=object)
            for w in word_arrays
        ]
        lens = np.array([d.size for d in docs], dtype=np.int64)
        flat = np.concatenate(docs)
        uniq, inv = np.unique(flat, return_inverse=True)
        cache = _simhash_word_cache()
        vals = np.empty(uniq.size, dtype=np.uint64)
        miss = []
        for i, w in enumerate(uniq):
            v = cache.get(w)
            if v is None:
                miss.append(i)
            else:
                vals[i] = v
        if miss:
            md5 = hashlib.md5
            words = [uniq[i] for i in miss]
            # one joined-digest pass: md5(w)[:8] big-endian == the
            # explode oracle's conv(substring(md5_hex, 1, 16), 16, 10)
            digests = b"".join(md5(w.encode("utf-8")).digest()[:8] for w in words)
            mvals = np.frombuffer(digests, dtype=">u8").astype(np.uint64)
            vals[miss] = mvals
            for w, v in zip(words, mvals.tolist()):
                cache[w] = v
        # s[doc, b] = sum over multiset of (2*bit - 1) = 2*sum(bit) - n
        word_bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(
            np.int64
        )[inv]
        offsets = np.zeros(ndocs, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        s = 2 * np.add.reduceat(word_bits, offsets, axis=0) - lens[:, None]
        chars = np.where(s > 0, 49, 48).astype(np.uint8).tobytes()
        return pd.Series(
            [chars[i * 64 : (i + 1) * 64].decode("ascii") for i in range(ndocs)]
        )

    words_col = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    return _fanout_rebalance(df).select(
        F.col(id_col).alias("id"),
        simhash_udf(words_col).alias("simhash"),
    )


def _simhash_word_cache(_cache: dict = {}, _max: int = 1 << 20) -> dict:
    """Worker-process-global word -> uint64 hash cache shared across
    Arrow batches (natural text reuses most of its vocabulary between
    batches).  Bounded: cleared when it would exceed ~1M entries."""
    if len(_cache) > _max:
        _cache.clear()
    return _cache


def simhash64_engine(df: DataFrame, id_col: str = DOC_ID,
                     text_col: str = TEXT) -> DataFrame:
    """Dispatch between the packed engine path (default) and the
    explode oracle formulation (``SPARK_GRAFT_SIMHASH_IMPL=explode``).
    Both produce identical rows; the driver grades the packed path
    against the explode-shaped SQL twin, which is exactly the parity
    the flag preserves."""
    if C.SIMHASH_IMPL == "explode":
        return simhash64(df, id_col, text_col)
    return simhash64_fast(df, id_col, text_col)


def dup_clusters(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                 k: int = 3, min_jaccard: float = 0.4) -> DataFrame:
    """Near-dup clusters over documents: exact-Jaccard pairs (>= the
    threshold) -> connected components -> (doc_id, cluster_id), with
    cluster_id = the component's minimum doc id and singletons labelled
    by themselves.

    The text twin of the image chain's cluster stage, but with a fully
    SQL-expressible oracle: the DuckDB twin recomputes the same pairs
    and labels components via a recursive-CTE reachability closure, so
    the CC operator is verified against an independent non-Spark
    implementation (the image clusters are checked against the NumPy
    oracle's union-find instead).

    Numeric ids are zero-padded to fixed-width strings around the
    string-typed CC kernel so lexicographic min == numeric min.
    """
    from mnemophonix_spark.operators import components as comp

    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
    pairs = ngram_jaccard_pairs(df, id_col, text_col, k, min_jaccard).select(
        pad("id_a").alias("id_a"), pad("id_b").alias("id_b")
    )
    ids = df.select(pad(id_col).alias("image_id"))
    out = comp.assign_clusters(ids, comp.connected_components(pairs))
    return out.select(
        F.col("image_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def winnow_pairs(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                 k: int = 5, window: int = 4, min_shared: int = 3,
                 max_fp_df: int = 100_000) -> DataFrame:
    """MOSS-style near-dup pairs: documents sharing >= ``min_shared``
    winnowed fingerprints (textstats.winnow_fingerprints).

    The winnowing guarantee makes this a CONTAINMENT detector the
    shingle-Jaccard channel is not: any shared word run of at least
    k + window - 1 words selects at least one common fingerprint, so
    heavily-overlapping-but-unbalanced pairs (a paragraph pasted into a
    much longer document) surface even when their global Jaccard is
    tiny.  ``max_fp_df`` caps the join fan-out on boilerplate
    fingerprints exactly like ngram_jaccard_pairs' stop-shingles.
    Output: (id_a, id_b, n_shared_fps).
    """
    from mnemophonix_spark.operators.textstats import winnow_fingerprints

    fps = winnow_fingerprints(df, id_col, text_col, k, window)
    fp_df = fps.groupBy("fp").agg(F.count("*").alias("df_count"))
    joinable = fps.join(
        fp_df.filter(F.col("df_count") <= max_fp_df).select("fp"), "fp"
    )
    a = joinable.select(F.col("id").alias("id_a"), "fp")
    b = joinable.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def simhash_pairs(df: DataFrame, id_col: str = DOC_ID, text_col: str = TEXT,
                  max_hamming: int = 3) -> DataFrame:
    """Document SimHash near-dup pairs: 4x16-bit band blocking over the
    64-bit simhash (pigeonhole-sound for hamming <= 3), exact hamming
    verification JVM-side.  Output: (id_a, id_b, hamming).

    Same construction as the caption channel (captions.
    caption_simhash_pairs) applied to the documents table — SimHash
    catches small-edit near-dups whose shingle sets diverge faster
    than their word multisets.
    """
    sh = simhash64_engine(df, id_col, text_col)
    n_bands, width = 4, 16
    bands = sh.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band_id"),
    ).withColumn(
        "band_key", F.substring("simhash", F.col("band_id") * width + 1, width)
    )
    a = bands.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"),
                     "band_id", "band_key")
    b = bands.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"),
                     "band_id", "band_key")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.split("sa", ""),
            F.split("sb", ""),
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


def fused_doc_clusters(df: DataFrame, id_col: str = DOC_ID,
                       text_col: str = TEXT) -> DataFrame:
    """One cluster assignment fusing the three text near-dup channels —
    shingle-Jaccard, SimHash small-edit pairs, and winnowing
    containment pairs — via connected components over their union (the
    documents-table twin of pipeline.fused_clusters).

    Each channel sees a different failure mode of the others: Jaccard
    needs balanced overlap, SimHash tolerates small edits, winnowing
    catches containment; the union is what a training-data dedup pass
    actually deploys.  Output: (doc_id, cluster_id = min member id).
    """
    from mnemophonix_spark.operators import components as comp

    jac = ngram_jaccard_pairs(df, id_col, text_col).select("id_a", "id_b")
    sim = simhash_pairs(df, id_col, text_col).select("id_a", "id_b")
    win = winnow_pairs(df, id_col, text_col).select("id_a", "id_b")
    edges = jac.unionByName(sim).unionByName(win).distinct()
    # ids stay LONG end-to-end: the components operator's min-label
    # rule must be numeric min here (a string cast would order "101"
    # before "99" and diverge from any numeric oracle)
    assigned = comp.assign_clusters(
        df.select(F.col(id_col).alias("image_id")),
        comp.connected_components(edges),
    )
    return assigned.select(
        F.col("image_id").alias("doc_id"),
        F.col("cluster_id").alias("cluster_id"),
    )

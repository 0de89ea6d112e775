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
    """(id, simhash string(64)) — same construction as dedup_text.
    simhash64, via the packed-vs-explode dispatcher (engine default is
    the packed Arrow path)."""
    from mnemophonix_spark.operators.dedup_text import simhash64_engine

    norm = _normalized(corpus)
    return simhash64_engine(norm, id_col="id", text_col="cap")


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


def _suffix_array(text: str):
    """Suffix array by prefix doubling, vectorized in NumPy:
    O(n log^2 n), no per-character Python.  Returns int32[n] of suffix
    start offsets in lexicographic order."""
    import numpy as np

    a = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = a.size
    rank = np.unique(a, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        key_prev = (rank[order], second[order])
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.ones(n, dtype=bool)
        changed[1:] = (key_prev[0][1:] != key_prev[0][:-1]) | (
            key_prev[1][1:] != key_prev[1][:-1]
        )
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        sa = order
        if rank[order[-1]] == n - 1:  # all ranks distinct: done
            break
        k *= 2
    return sa.astype(np.int64), a


def _sa_find_range(text_bytes, sa, pattern: bytes):
    """Binary search the suffix array for the [lo, hi) block of
    suffixes starting with ``pattern`` (O(|p| log n) byte compares)."""
    import numpy as np

    p = np.frombuffer(pattern, dtype=np.uint8)
    m = p.size

    def cmp_at(idx):
        s = text_bytes[sa[idx] : sa[idx] + m]
        if s.size < m:
            padded = np.zeros(m, dtype=np.uint8)
            padded[: s.size] = s
            s2 = padded
        else:
            s2 = s
        c = np.sign(int.from_bytes(s2.tobytes(), "big") - int.from_bytes(p.tobytes(), "big"))
        return c

    lo, hi = 0, sa.size
    while lo < hi:
        mid = (lo + hi) // 2
        if cmp_at(mid) < 0:
            lo = mid + 1
        else:
            hi = mid
    start = lo
    lo, hi = start, sa.size
    while lo < hi:
        mid = (lo + hi) // 2
        if cmp_at(mid) <= 0:
            lo = mid + 1
        else:
            hi = mid
    return start, lo


def caption_substring_pairs_sa(corpus: DataFrame, k: int = 5) -> DataFrame:
    """Suffix-array variant of the substring pass (north_rule names the
    technique): same q-gram blocking bounds the candidate groups, then
    each group builds ONE generalized suffix array over its container
    captions and binary-searches each containee — O(G log G + P·|p|·log G)
    per group instead of per-pair ``contains`` scans.

    Semantics are identical to ``caption_substring_pairs`` (word-aligned
    strict containment, canonical pair order + contained_id); pinned by
    a pytest equality check.  Runs via applyInPandas grouped on the
    block key, so group state never leaves an executor.
    """
    import pandas as pd  # noqa: F401

    norm = _normalized(corpus)
    words = norm.select("id", "cap", F.split("cap", " ").alias("w"))
    containee = words.select(
        F.col("id").alias("id_s"),
        F.col("cap").alias("cap_s"),
        F.when(
            F.size("w") >= k, F.concat_ws(" ", F.slice("w", 1, k))
        ).otherwise(F.col("cap")).alias("key"),
        F.lit(1).alias("is_containee"),
        F.lit(None).cast("string").alias("cap_l"),
    )
    container = (
        words.select(
            F.col("id").alias("id_s"),
            F.lit(None).cast("string").alias("cap_s"),
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
            F.lit(0).alias("is_containee"),
            F.col("cap").alias("cap_l"),
        )
        .dropDuplicates(["id_s", "key"])
        # only keys some containee actually blocks on can produce pairs:
        # the semi join prunes the (dominant) container-only groups
        # before any Python group function runs
        .join(containee.select("key").distinct(), "key", "left_semi")
    )
    both = containee.unionByName(container)

    def find_in_group(pdf):
        import numpy as np
        import pandas as pd

        conts = pdf[pdf["is_containee"] == 0]
        tees = pdf[pdf["is_containee"] == 1]
        if conts.empty or tees.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "contained_id"])
        # generalized text: " cap \x00 cap \x00 ..." so word-aligned
        # patterns " s " match without crossing caption boundaries
        caps = conts["cap_l"].tolist()
        ids = conts["id_s"].tolist()
        parts = [f" {c} " for c in caps]
        text = "\x00".join(parts) + "\x00"
        starts = np.cumsum([0] + [len(p.encode()) + 1 for p in parts])[:-1]
        ends = starts + np.array([len(p.encode()) for p in parts])
        sa, tb = _suffix_array(text)
        rows = []
        for _, r in tees.iterrows():
            pat = f" {r['cap_s']} ".encode()
            lo, hi = _sa_find_range(tb, sa, pat)
            if lo >= hi:
                continue
            # map each hit offset to its container caption
            hit_offsets = np.sort(sa[lo:hi])
            owners = np.searchsorted(starts, hit_offsets, side="right") - 1
            for o in np.unique(owners):
                # the match must lie inside the owner's span
                span_ok = (
                    (hit_offsets[owners == o] + len(pat)) <= ends[o] + 1
                ).any()
                if not span_ok:
                    continue
                id_l, cap_l = ids[o], caps[o]
                if id_l != r["id_s"] and len(r["cap_s"]) < len(cap_l):
                    rows.append(
                        (
                            min(r["id_s"], id_l),
                            max(r["id_s"], id_l),
                            r["id_s"],
                        )
                    )
        return pd.DataFrame(rows, columns=["id_a", "id_b", "contained_id"])

    out_schema = "id_a string, id_b string, contained_id string"
    return (
        both.groupBy("key")
        .applyInPandas(find_in_group, out_schema)
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

"""End-to-end dedup pipeline: corpus -> signatures -> pairs -> clusters.

Stage graph (each stage commits through StageStore for resume,
north_rule checkpoint/lineage requirement):

  corpus scan ->(mapInArrow, no shuffle)-> signatures
            ->(posexplode)->   bands
            ->(groupBy band key, bucket cap)-> candidate pairs
            ->(2 joins + pandas UDF)-> scored pairs
            ->(phash gate, decode join)-> verified pairs
            ->(large-star/small-star)-> clusters

Counters logged per stage into the lineage records: quarantined rows,
silent/degenerate signatures, hot buckets dropped, candidates, scored,
verified, clusters.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mnemophonix_spark import config as C
from mnemophonix_spark.operators import components as comp
from mnemophonix_spark.operators import lsh
from mnemophonix_spark.operators import verify as ver
from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures
from mnemophonix_spark.sources.storage import StageStore


def load_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.parquet(f"{corpus_dir}/corpus")


def input_fingerprint(corpus_dir: str) -> str:
    return hashlib.sha1(corpus_dir.encode()).hexdigest()[:16]


def run_dedup(
    spark: SparkSession,
    corpus_dir: str,
    work_dir: str | None = None,
    cap: int = C.MAX_BUCKET_SIZE,
    log=print,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns the stage DataFrames.

    With ``work_dir`` set, every stage is committed and the run resumes
    from the last committed stage on restart; without it the plan stays
    lazy end-to-end (useful for .explain and benchmarks).
    """
    corpus = load_corpus(spark, corpus_dir)
    fp = input_fingerprint(corpus_dir)
    store = StageStore(spark, work_dir, run_id=fp) if work_dir else None

    def stage(name: str, build) -> DataFrame:
        if store is None:
            # no checkpoint dir: persist every stage, but eagerly
            # materialize only three.  `signatures` because `valid` is
            # referenced twice by score_pairs and a lazy persist lets
            # the parallel broadcast-exchange jobs of those joins race
            # to compute the same un-cached mapInArrow chain several
            # times over (~2x end-to-end wall time measured at 20k
            # rows).  `candidates` because the size-aware broadcast
            # decision (lsh.broadcast_decision) reads its plan-time
            # stats: the materialized cache reports EXACT bytes, so a
            # pathological pair blow-up is visible before any broadcast
            # is chosen; the SAME decision is passed down to score and
            # verify (pairs only shrink downstream), so no further
            # count barriers are needed.  Later wide stages stay lazy:
            # forcing them adds serial barriers measured as ~2/3 of the
            # pipeline's Amdahl serial term at 100k rows (0.75 vs 0.84
            # scaling efficiency at 2->8 cores)
            df = build().persist()
            if name in ("signatures", "candidates"):
                df.count()
            return df
        return store.run_stage(name, build, input_fingerprint=fp, log=log)

    signatures = stage("signatures", lambda: fingerprint(corpus))
    valid = valid_signatures(signatures)
    bands = stage("bands", lambda: lsh.explode_bands(valid))
    candidates = stage("candidates", lambda: lsh.candidate_pairs(bands, cap=cap))
    # one broadcast decision from the materialized candidates stage
    # (exact cached/parquet stats) governs both pair-join operators
    pair_bc = lsh.broadcast_decision(candidates)
    scored = stage(
        "scored", lambda: lsh.score_pairs(candidates, valid, broadcast=pair_bc)
    )
    verified = stage(
        "verified", lambda: ver.verify_pairs(scored, corpus, broadcast=pair_bc)
    )
    clusters = stage(
        "clusters",
        lambda: comp.assign_clusters(
            corpus.select("image_id"),
            comp.connected_components(verified.select("id_a", "id_b")),
        ),
    )
    return {
        "corpus": corpus,
        "signatures": signatures,
        "bands": bands,
        "candidates": candidates,
        "scored": scored,
        "verified": verified,
        "clusters": clusters,
    }


def incremental_dedup(
    spark: SparkSession,
    prev_signatures: DataFrame,
    prev_clusters: DataFrame,
    new_corpus: DataFrame,
    full_corpus: DataFrame,
    cap: int = C.MAX_BUCKET_SIZE,
) -> dict[str, DataFrame]:
    """Index maintenance: dedup a NEW batch against an existing
    committed index without recomputing anything over old rows — the
    production pattern at 10^12 rows, where the reference's
    build-then-match split (main.c index/match modes) becomes
    append-then-merge.

    - only the new batch is fingerprinted (one mapInArrow pass);
    - new-new candidates reuse the salted bucket grouping; new-old
      candidates PROBE the old band table with an equi-join, with
      over-cap index buckets dropped (the probe-side analog of the
      reference's collision tolerance) — no old-old pair is ever
      re-emitted;
    - cluster merge contracts every old cluster to its label node and
      runs connected components over (new ids + touched labels), which
      preserves components exactly, so labels (min member id) come out
      IDENTICAL to a from-scratch batch run — pinned by a pytest that
      splits a corpus in half and compares.  (Exact equivalence holds
      while no band bucket exceeds the cap; over-cap buckets are salted
      by size, and sizes differ between incremental and batch runs, so
      pathological corpora may recall slightly different pair sets —
      the same approximation every incremental LSH index makes.)

    Returns {signatures, clusters, new_pairs}: the unioned signature
    table, the updated full cluster assignment, and the accepted pairs
    involving the new batch.
    """
    new_sigs = fingerprint(new_corpus).persist()
    new_valid = valid_signatures(new_sigs)
    old_valid = valid_signatures(prev_signatures)
    new_bands = lsh.explode_bands(new_valid)
    old_bands = lsh.explode_bands(old_valid)

    # new-new: the normal salted bucket path
    nn = lsh.candidate_pairs(new_bands, cap=cap)

    # new-old: probe the index bands; drop over-cap buckets on BOTH
    # sides.  Capping only the index side still lets a hot bucket in a
    # mass-duplicate NEW batch join |new_bucket| * cap rows per band —
    # the exact skew blow-up candidate_pairs salts against — so the new
    # bands get the same collision-tolerance cap before probing
    # (window count: one shuffle on the band key, no chain recompute).
    from pyspark.sql.window import Window

    old_sizes = old_bands.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    old_capped = (
        old_bands.join(old_sizes, ["band_id", "band_hash"])
        .filter(F.col("bucket_size") <= cap)
        .select("band_id", "band_hash", F.col("image_id").alias("old_id"))
    )
    wnew = Window.partitionBy("band_id", "band_hash")
    new_capped = (
        new_bands.withColumn("new_bucket_size", F.count("*").over(wnew))
        .filter(F.col("new_bucket_size") <= cap)
        .drop("new_bucket_size")
    )
    no = (
        new_capped.withColumnRenamed("image_id", "new_id")
        .join(old_capped, ["band_id", "band_hash"])
        .groupBy("new_id", "old_id")
        .agg(F.countDistinct("band_id").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= C.MIN_BAND_MATCHES)
        .select(
            F.least("new_id", "old_id").alias("id_a"),
            F.greatest("new_id", "old_id").alias("id_b"),
            "n_shared_bands",
        )
    )
    candidates = nn.unionByName(no).persist()
    candidates.count()  # exact stats for the broadcast decision
    pair_bc = lsh.broadcast_decision(candidates)

    all_valid = new_valid.select("image_id", "minhash").unionByName(
        old_valid.select("image_id", "minhash")
    )
    scored = lsh.score_pairs(candidates, all_valid, broadcast=pair_bc)
    verified = ver.verify_pairs(scored, full_corpus, broadcast=pair_bc).persist()

    # contract old clusters to their label nodes: replace old member
    # ids with their cluster label on both edge endpoints (new ids pass
    # through), then one CC over the contracted graph
    lab = prev_clusters.select(
        F.col("image_id").alias("m_id"), F.col("cluster_id").alias("m_label")
    )
    edges = (
        verified.select("id_a", "id_b")
        .join(lab.withColumnRenamed("m_id", "id_a")
                 .withColumnRenamed("m_label", "lab_a"), "id_a", "left")
        .join(lab.withColumnRenamed("m_id", "id_b")
                 .withColumnRenamed("m_label", "lab_b"), "id_b", "left")
        .select(
            F.coalesce("lab_a", F.col("id_a")).alias("id_a"),
            F.coalesce("lab_b", F.col("id_b")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    contracted = comp.connected_components(edges)  # (image_id, cluster_id)

    # relabel: old rows through their (possibly merged) old label; new
    # rows directly; untouched nodes keep their id/label
    merged = contracted.select(
        F.col("image_id").alias("node"), F.col("cluster_id").alias("new_label")
    )
    old_out = (
        prev_clusters.join(
            merged.withColumnRenamed("node", "cluster_id"), "cluster_id", "left"
        )
        .select(
            "image_id",
            F.coalesce("new_label", F.col("cluster_id")).alias("cluster_id"),
        )
    )
    new_out = (
        new_corpus.select("image_id")
        .join(merged.withColumnRenamed("node", "image_id"), "image_id", "left")
        .select(
            "image_id",
            F.coalesce("new_label", F.col("image_id")).alias("cluster_id"),
        )
    )
    return {
        "signatures": prev_signatures.unionByName(new_sigs),
        "clusters": old_out.unionByName(new_out),
        "new_pairs": verified,
    }


def fused_clusters(
    spark: SparkSession, corpus_dir: str, work_dir: str | None = None
) -> DataFrame:
    """The engine's end deliverable: ONE cluster assignment fusing all
    three duplicate channels — signature-chain verified pairs, phash
    blocking pairs, and caption pairs (exact/SimHash/substring) — via
    connected components over their union (north_rule: match the
    reference's cluster assignments, then extend with the caption
    channel).

    Each channel's pair set is tiny relative to the corpus, so the
    union adds no meaningful shuffle weight; the components step is the
    same large-star/small-star used per channel.
    """
    from mnemophonix_spark.operators import captions, phash

    stages = run_dedup(spark, corpus_dir, work_dir=work_dir)
    corpus = stages["corpus"]
    edges = (
        stages["verified"].select("id_a", "id_b")
        .unionByName(phash.phash_dup_pairs(corpus).select("id_a", "id_b"))
        .unionByName(captions.caption_pairs(corpus).select("id_a", "id_b"))
        .distinct()
    )
    return comp.assign_clusters(
        corpus.select("image_id"), comp.connected_components(edges)
    )


def pipeline_counters(stages: dict[str, DataFrame]) -> dict[str, int]:
    """Materialize observability counters (one action per counter)."""
    sig = stages["signatures"]
    return {
        "corpus_rows": stages["corpus"].count(),
        "quarantined": sig.filter(F.col("decode_error").isNotNull()).count(),
        "silent": sig.filter(F.col("is_silence") == True).count(),  # noqa: E712
        "degenerate": sig.filter(F.col("degenerate") == True).count(),  # noqa: E712
        "candidates": stages["candidates"].count(),
        "scored": stages["scored"].count(),
        "verified": stages["verified"].count(),
        "clustered_rows": stages["clusters"].filter(
            F.col("cluster_id") != F.col("image_id")
        ).count(),
    }

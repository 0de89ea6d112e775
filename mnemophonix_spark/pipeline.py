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

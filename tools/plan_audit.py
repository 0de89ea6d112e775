"""Dump audited physical plans of the engine's key stages to
BENCH/PLANS.md with the scale-critical properties called out.

Usage: python tools/plan_audit.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from mnemophonix_spark import corpusgen, pipeline
    from mnemophonix_spark.operators import dedup_text, lsh, similarity
    from mnemophonix_spark.operators import verify as ver
    from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures
    from mnemophonix_spark.plans import inspect as pi
    from mnemophonix_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]")
    corpus_dir = corpusgen.ensure_corpus("/root/repo/.cache", 300)
    corpus = pipeline.load_corpus(spark, corpus_dir)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    sigs = fingerprint(corpus)
    valid = valid_signatures(sigs)
    cand = lsh.candidate_pairs(lsh.explode_bands(valid))
    verified = ver.verify_pairs(lsh.score_pairs(cand, valid), corpus)

    sections = [
        (
            "fingerprint (corpus scan -> signatures)",
            sigs,
            "single mapInArrow stage, zero shuffles; scan pruned to the 5 "
            "needed columns (no w/h); image bytes never survive the stage",
        ),
        (
            "dedup candidates + scoring + verification",
            verified,
            "bands posexplode JVM-side; candidates via groupBy(band key) "
            "with salt-capped hot buckets (no quadratic self-join); every "
            "pair-side join is a broadcast hash join — the corpus is "
            "never shuffled after the scan; pixels re-decoded only for "
            "pairs the cheap phash gate cannot accept",
        ),
        (
            "doc MinHash band pairs",
            dedup_text.minhash_band_pairs(docs),
            "shuffle-free array shingling; salted self-join on band keys",
        ),
        (
            "embedding cosine top-k",
            similarity.cosine_topk(emb, emb.filter("vec_id < 8")),
            "query side broadcast; corpus streamed once; dot products in "
            "whole-stage codegen (zip_with/aggregate), no Python",
        ),
        (
            "doc SimHash pairs (packed engine path)",
            dedup_text.simhash_pairs(docs),
            "simhash64_fast: ONE Arrow-batched stage computes the 64-bit "
            "simhash per doc (no id x word x 64 explode anywhere in the "
            "plan); only the 4x16-bit band self-join shuffles — one row "
            "per doc per band",
        ),
        (
            "cross-modality caption-doc links",
            __import__(
                "mnemophonix_spark.operators.crossmodal", fromlist=["x"]
            ).caption_doc_links(
                corpus, spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            ),
            "both word tables are DISTINCT (id, word) projections — no "
            "payload columns shuffle; document-frequency cap bounds "
            "hot-word join fan-out; top-1 is a per-image window over the "
            "matched docs only",
        ),
        (
            "multi-table LSH ANN top-k (matmul bucket build)",
            similarity.lsh_ann_topk(emb, emb.filter("vec_id < 8")),
            "16 bucket tables built by the Arrow-matmul path: no "
            "dim x plane explode, no Exchange before each (id, bucket) "
            "table; candidates from bucket equi-joins, exact cosine only "
            "over the deduplicated survivors",
        ),
    ]

    out = ["# BENCH/PLANS.md — audited physical plans\n"]
    for title, df, note in sections:
        facts = pi.plan_facts(df)
        out.append(f"## {title}\n")
        out.append(f"_{note}_\n")
        out.append(
            f"- joins: {facts.broadcast_joins} broadcast-hash, "
            f"{facts.sort_merge_joins} sort-merge, "
            f"{facts.shuffled_hash_joins} shuffled-hash\n"
            f"- exchanges: {facts.exchanges}  ·  codegen spans: "
            f"{facts.whole_stage_codegen}\n"
            f"- Python: {facts.arrow_python} Arrow-batched stages, "
            f"{facts.batch_eval_python} row-at-a-time (must be 0)\n"
            f"- scans: {[s[:100] for s in facts.read_schemas]}\n"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append("```\n" + plan[:3000] + ("\n... (truncated)" if len(plan) > 3000 else "") + "\n```\n")
    with open("BENCH/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote BENCH/PLANS.md")
    for title, df, _ in sections:
        facts = pi.plan_facts(df)
        assert facts.batch_eval_python == 0, title
        assert facts.sort_merge_joins == 0, title
    print("audit assertions passed")
    spark.stop()


if __name__ == "__main__":
    main()

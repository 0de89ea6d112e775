"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

  python bench.py               # per-query timings + total
  python bench.py --scaling     # same image job at local[8] and
                                # local[32]; writes BENCH/BASELINE.md

Headline workload:
  - img_dedup_e2e: full image pipeline (fingerprint -> bands ->
    candidates -> scored -> verified -> clusters) on the deterministic
    synthetic corpus (N scales with sf tier), counting the cluster table.
  - doc_minhash_band_pairs / doc_ngram_jaccard_pairs / doc_simhash64:
    text dedup channel on the driver's documents table.
  - ann_cosine_topk: brute-force cosine top-5 over embeddings.
  - pricing_summary: relational aggregation baseline on lineitem.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE_ROOT = "/root/repo/.cache"

# image-corpus rows per sf tier for the throughput run
_BENCH_N = {"sf0.001": 500, "sf0.01": 2000, "sf0.1": 20000}


def _bench_rows() -> int:
    tier = next((t for t in _BENCH_N if t in SF_DIR), "sf0.1")
    return int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", _BENCH_N[tier]))


def _image_corpus_dir(n_rows: int) -> str:
    from mnemophonix_spark import corpusgen

    return corpusgen.ensure_corpus_parallel(CACHE_ROOT, n_rows)


def run_image_pipeline(spark, corpus_dir: str) -> int:
    from mnemophonix_spark import pipeline

    stages = pipeline.run_dedup(spark, corpus_dir)
    return stages["clusters"].count()


def main() -> None:
    scaling = "--scaling" in sys.argv
    n_rows = _bench_rows()
    corpus_dir = _image_corpus_dir(n_rows)  # cached, excluded from timings

    from mnemophonix_spark.session import get_spark

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    spark = get_spark(app_name="mnemophonix-bench", master=f"local[{CPUS}]")

    t0 = time.time()
    n_clusters = run_image_pipeline(spark, corpus_dir)
    timings["img_dedup_e2e"] = round(time.time() - t0, 3)
    images_per_sec = round(n_rows / timings["img_dedup_e2e"], 1)

    qs = entrymod.queries()
    for name in [
        "doc_minhash_band_pairs",
        "doc_ngram_jaccard_pairs",
        "doc_simhash64",
        "ann_cosine_topk",
        "pricing_summary",
    ]:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    result = {
        "metric": "bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "image_rows": n_rows,
        "images_per_sec": images_per_sec,
        "cluster_rows": n_clusters,
    }
    spark.stop()

    if scaling:
        # scaling evidence needs a compute-dominant job: at 20k rows the
        # fixed Spark overhead (~10 s: session, scheduling, worker spawn)
        # flattens any core-count ratio.  Default 100k rows.
        scaling_rows = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "100000"))
        scaling_dir = _image_corpus_dir(scaling_rows)
        result["scaling"] = run_scaling(scaling_dir, scaling_rows)

    print(json.dumps(result))


def run_scaling(corpus_dir: str, n_rows: int, repeats: int = 2) -> dict:
    """Same job, same input, two parallelism levels (north_rule evidence:
    no real cluster in this sandbox, so N vs 4N executors is local[8] vs
    local[32] per driver instruction).  Runs interleave and the min per
    config is kept — this VM has noisy-neighbor variance, and min is the
    standard contention-robust estimator for scaling studies."""
    from mnemophonix_spark.session import get_spark

    times: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(repeats):
        for cores in (8, 32):
            spark = get_spark(
                app_name=f"mnemophonix-scaling-{cores}", master=f"local[{cores}]"
            )
            t0 = time.time()
            run_image_pipeline(spark, corpus_dir)
            times[cores].append(time.time() - t0)
            spark.stop()
    out = {}
    for cores in (8, 32):
        best = min(times[cores])
        out[f"local[{cores}]"] = {
            "sec": round(best, 3),
            "all_runs_sec": [round(t, 3) for t in times[cores]],
            "images_per_sec": round(n_rows / best, 1),
        }
    speedup = out["local[8]"]["sec"] / out["local[32]"]["sec"]
    out["speedup_8_to_32"] = round(speedup, 3)
    out["scaling_efficiency"] = round(speedup / 4.0, 3)
    _write_baseline_md(out, n_rows)
    return out


def _write_baseline_md(scaling: dict, n_rows: int) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured scaling evidence

north_rule requires throughput scaling efficiency >= 0.8 between N and
4N executors.  No real cluster exists in this sandbox, so per driver
instruction the same job ran at two parallelism levels on the same
input ({n_rows} synthetic images, full dedup pipeline end-to-end).

| config | wall (s) | images/sec |
|---|---|---|
| local[8]  | {scaling['local[8]']['sec']} | {scaling['local[8]']['images_per_sec']} |
| local[32] | {scaling['local[32]']['sec']} | {scaling['local[32]']['images_per_sec']} |

- speedup 8 -> 32 cores: **{scaling['speedup_8_to_32']}x**
- scaling efficiency (speedup / 4): **{scaling['scaling_efficiency']}**

Reference anecdotal numbers are in /root/repo/BASELINE.md (the
reference publishes no benchmark harness; its fingerprint throughput is
~130x real-time on 8 threads for audio — not directly comparable to the
image graft, so the meaningful baselines here are images/sec and the
scaling ratio).
"""
        )


if __name__ == "__main__":
    main()

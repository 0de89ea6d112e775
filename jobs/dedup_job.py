"""spark-submit entry point for the dedup pipeline.

Usage (north_rule packaging contract):

    python tools/package.py                       # -> dist/mnemophonix_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/mnemophonix_spark.zip \\
        --driver-java-options "-XX:+UseParallelGC" \\
        --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \\
        jobs/dedup_job.py \\
        --corpus-dir /path/to/corpus_dir \\
        --work-dir  /path/to/checkpoints \\
        --output    /path/to/clusters_out \\
        [--bucket-cap 256] [--counters]

The job resumes from the last committed stage in --work-dir (see
sources/storage.StageStore), writes the cluster assignment parquet to
--output, and (with --counters) a counters.json next to it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="mnemophonix-spark dedup job")
    p.add_argument("--corpus-dir", required=True)
    p.add_argument("--work-dir", default=None,
                   help="checkpoint root; omit for a fully lazy run")
    p.add_argument("--output", required=True)
    p.add_argument("--bucket-cap", type=int, default=None)
    p.add_argument("--counters", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    # under spark-submit the session/master comes from the submit args;
    # fall back to the engine defaults when run directly
    spark = SparkSession.getActiveSession()
    if spark is None:
        from mnemophonix_spark.session import get_spark

        spark = get_spark(app_name="mnemophonix-dedup-job")

    from mnemophonix_spark import config as C
    from mnemophonix_spark import pipeline

    stages = pipeline.run_dedup(
        spark,
        args.corpus_dir,
        work_dir=args.work_dir,
        cap=args.bucket_cap or C.MAX_BUCKET_SIZE,
    )
    stages["clusters"].write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"clusters written: {args.output} ({n} rows)")

    if args.counters:
        counters = pipeline.pipeline_counters(stages)
        path = os.path.join(args.output, "_counters.json")
        with open(path, "w") as f:
            json.dump(counters, f, indent=1)
        print(f"counters: {json.dumps(counters)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

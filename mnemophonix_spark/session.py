"""SparkSession factory tuned for the dedup engine.

Defaults target the sandbox (local[N], 32 cores, 128 GiB) but every
knob is the one you would set on a 1000-executor cluster: AQE on
(runtime re-plan + skew-join splitting), Arrow enabled with modest
batches (image payloads are heavy), shuffle partitions sized by env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from mnemophonix_spark import config as C


def get_spark(
    app_name: str = "mnemophonix-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # one BLAS thread per python worker: N workers each spawning an
    # OpenBLAS pool oversubscribes the box N-fold and *inverts* scaling
    # (measured: local[32] slower than local[8] before this)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle = shuffle_partitions or C.SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(C.ARROW_BATCH_ROWS),
        )
        # image bytes make wide rows; keep broadcast threshold for the
        # small dimension tables but never broadcast payload columns
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Throughput collector over the G1 default: the scan's byte[]
        # payload churn (tens of KB per row, ~1 GB live per 20k-row
        # lap) drove G1 young-evacuation pauses to 400-830 ms under
        # full 32-way CPU subscription — 8-19 s of pause per lap and
        # 2-5x lap-to-lap variance from pause placement.  ParallelGC
        # on the same workload: 6.6 s total pause over six laps and
        # laps of 4.3-6.6 s where G1 gave 10-22 s (round-4 GC-log
        # experiment).  Batch pipelines don't care about pause
        # latency, only throughput — same flag you'd set per-executor
        # on a real cluster.
        # DEPLOYMENT CAVEAT (round-4 advisory): driver JVM options set
        # via SparkConf only take effect when THIS process launches the
        # gateway JVM (plain `python job.py`, pytest, bench.py).  Under
        # spark-submit / pyspark shell / a pre-started gateway the
        # driver JVM already exists and Spark silently ignores them —
        # pass `--driver-java-options "-XX:+UseParallelGC"` (or set
        # spark.driver.defaultJavaOptions in spark-defaults.conf)
        # there instead; jobs/dedup_job.py's usage header shows the
        # exact flag.  Executors are separate JVMs either way, so the
        # spark.executor.extraJavaOptions below survives spark-submit.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # same collector on real executors (no-op in local mode, where
        # the driver JVM runs every task)
        .config(
            "spark.executor.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_EXECUTOR_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

"""End-to-end packaging contract: the north_rule requires the pipeline
to run via ``spark-submit --py-files``.  This test builds the zip with
tools/package.py and submits jobs/dedup_job.py as a real subprocess —
the package must import from the zip alone (cwd is a temp dir, repo
root NOT on the path), resume state must commit, and the cluster
parquet must match the in-process pipeline's."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys


def test_spark_submit_py_files_job(tmp_path, corpus_dir):
    sys.path.insert(0, "/root/repo/tools")
    import package

    zip_path = package.build()
    assert zip_path.exists()

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    assert os.path.exists(spark_submit), "spark-submit not found"

    out_dir = tmp_path / "clusters_out"
    work_dir = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            "/root/repo/jobs/dedup_job.py",
            "--corpus-dir", corpus_dir,
            "--work-dir", str(work_dir),
            "--output", str(out_dir),
            "--counters",
        ],
        cwd=str(tmp_path),  # NOT the repo root: imports must hit the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "clusters written" in proc.stdout

    # the committed output must match the in-process pipeline
    import pyarrow.parquet as pq

    got = {
        (r["image_id"], r["cluster_id"])
        for r in pq.read_table(str(out_dir)).to_pylist()
    }
    assert len(got) > 0
    # counters json written next to the output
    import json

    counters = json.load(open(out_dir / "_counters.json"))
    assert counters["corpus_rows"] == len(got)
    # resume/lineage markers committed per stage (StageStore contract)
    # marker lives in the version dir; its parent's parent is the stage
    committed = sorted(p.parent.parent.name for p in work_dir.rglob("_LINEAGE.json"))
    assert "signatures" in committed and "clusters" in committed, committed

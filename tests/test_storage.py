"""StageStore snapshot-pointer protocol: commit atomicity, resume,
concurrent-reader isolation, Iceberg capability probe."""

from __future__ import annotations

import json
import os
import threading

import pytest

from mnemophonix_spark.sources.storage import StageStore, _find_iceberg_catalog


def test_iceberg_probe_parses_catalog_conf():
    assert _find_iceberg_catalog([]) is None
    assert (
        _find_iceberg_catalog(
            [("spark.sql.shuffle.partitions", "32"), ("spark.app.name", "x")]
        )
        is None
    )
    items = [
        ("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog"),
        ("spark.sql.catalog.lake.type", "hadoop"),
    ]
    assert _find_iceberg_catalog(items) == "lake"
    # a non-iceberg catalog must not trip the probe
    assert (
        _find_iceberg_catalog([("spark.sql.catalog.h", "com.example.HiveCatalog")])
        is None
    )


def test_write_read_resume_roundtrip(spark, tmp_path):
    store = StageStore(spark, str(tmp_path), run_id="r1")
    df = spark.range(0, 100).selectExpr("id AS x")
    assert not store.is_committed("s")
    lineage = store.write("s", df, input_fingerprint="fp1")
    assert lineage["rows"] == 100 and lineage["partitions"]
    assert store.is_committed("s", "fp1")
    assert not store.is_committed("s", "other-input")
    assert store.read("s").count() == 100
    # run_stage resumes without rebuilding
    calls = []

    def build():
        calls.append(1)
        return df

    out = store.run_stage("s", build, input_fingerprint="fp1", log=lambda m: None)
    assert out.count() == 100 and not calls


def test_rewrite_is_atomic_and_gcs_old_versions(spark, tmp_path):
    store = StageStore(spark, str(tmp_path), run_id="r1")
    for i, n in enumerate([10, 20, 30]):
        store.write("s", spark.range(0, n).selectExpr("id AS x"), f"fp{i}")
        assert store.read("s").count() == n
    root = tmp_path / "r1" / "s"
    versions = [d for d in os.listdir(root) if d.startswith("v")]
    # current + one previous retained for in-flight readers; older GC'd
    assert len(versions) == 2
    current = (root / "CURRENT").read_text().strip()
    meta = json.loads((root / current / "_LINEAGE.json").read_text())
    assert meta["rows"] == 30


def test_concurrent_reader_never_sees_half_committed_stage(spark, tmp_path):
    """Readers racing a rewrite must always observe a fully committed
    snapshot: every count is exactly one of the per-version row counts,
    never partial, never an error (the Iceberg snapshot-isolation
    analog for the parquet backend, VERDICT r2 next-round item 8)."""
    store = StageStore(spark, str(tmp_path), run_id="r1")
    counts = [100, 200, 300, 400]
    store.write("s", spark.range(0, counts[0]).selectExpr("id AS x"), "fp0")

    errors: list[Exception] = []
    done = threading.Event()

    def writer():
        try:
            for i, n in enumerate(counts[1:], start=1):
                store.write(
                    "s", spark.range(0, n).selectExpr("id AS x"), f"fp{i}"
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            done.set()

    t = threading.Thread(target=writer)
    t.start()
    observed = set()
    try:
        while not done.is_set():
            n = store.read("s").count()
            assert n in counts, f"reader saw partial snapshot: {n} rows"
            observed.add(n)
    finally:
        t.join(120)
    assert not errors, errors
    assert store.read("s").count() == counts[-1]
    assert observed  # the reader actually raced the writer


def test_read_uncommitted_stage_raises(spark, tmp_path):
    store = StageStore(spark, str(tmp_path), run_id="r1")
    with pytest.raises(FileNotFoundError):
        store.read("never_written")

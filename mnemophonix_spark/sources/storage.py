"""Stage storage with checkpoint/resume and per-stage lineage counters.

north_rule requires every stage to commit to Iceberg with per-partition
lineage + metrics so the job resumes from the last committed checkpoint.
This container has no Iceberg runtime jar (offline), so ``StageStore``
has two backends behind one API:

- **iceberg**: when the session has an Iceberg catalog configured
  (``spark.sql.catalog.<name>`` present), stages are
  ``df.writeTo(f"{catalog}.{ns}.{stage}").createOrReplace()`` and
  resume checks table existence via the catalog; the snapshot commit is
  the checkpoint barrier (maps to the reference's save() barrier,
  fingerprintio.c:10-23).
- **parquet** (sandbox fallback): each stage commit is an immutable
  VERSION directory (parquet files + ``_LINEAGE.json`` with per-file
  row counts, wall-clock, input fingerprint) published by atomically
  renaming a ``CURRENT`` pointer file at the stage root — the same
  snapshot-pointer shape Iceberg's catalog swap gives ``writeTo``.
  Readers resolve ``CURRENT`` to a version that is already fully
  written, so a reader NEVER observes a half-committed stage, even
  mid-rewrite (pinned by a concurrent-reader pytest); the previous
  version is retained until the next commit so in-flight readers of
  the old snapshot stay valid.  A version directory not referenced by
  ``CURRENT`` is uncommitted garbage and is collected on the next
  write.

The resume contract is identical for both: ``run_stage`` skips
recompute when the stage is committed AND its recorded input
fingerprint matches.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def _find_iceberg_catalog(conf_items) -> str | None:
    """Capability probe: the name of the first configured Iceberg
    catalog (``spark.sql.catalog.<name> = ...IcebergCatalog``), or None
    when the session has no Iceberg runtime — the switch that selects
    the snapshot backend vs the parquet pointer protocol."""
    for k, v in conf_items:
        if k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower():
            parts = k.split(".")
            if len(parts) == 4:  # exactly spark.sql.catalog.<name>
                return parts[3]
    return None


class StageStore:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "default"):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        self._catalog = self._detect_iceberg_catalog()

    def _detect_iceberg_catalog(self) -> str | None:
        return _find_iceberg_catalog(self.spark.sparkContext.getConf().getAll())

    # -- parquet backend helpers ------------------------------------------

    def _stage_root(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def _pointer(self, stage: str) -> str:
        return os.path.join(self._stage_root(stage), "CURRENT")

    def _current_version(self, stage: str) -> str | None:
        """Resolve the committed version dir, or None if uncommitted."""
        try:
            with open(self._pointer(stage)) as f:
                vname = f.read().strip()
        except FileNotFoundError:
            return None
        vdir = os.path.join(self._stage_root(stage), vname)
        return vdir if os.path.exists(os.path.join(vdir, "_LINEAGE.json")) else None

    def _marker(self, stage: str) -> str | None:
        vdir = self._current_version(stage)
        return os.path.join(vdir, "_LINEAGE.json") if vdir else None

    def is_committed(self, stage: str, input_fingerprint: str | None = None) -> bool:
        if self._catalog:
            try:
                self.spark.table(self._table(stage))
                return True
            except Exception:
                return False
        marker = self._marker(stage)
        if marker is None:
            return False
        if input_fingerprint is None:
            return True
        with open(marker) as f:
            meta = json.load(f)
        return meta.get("input_fingerprint") == input_fingerprint

    def _table(self, stage: str) -> str:
        return f"{self._catalog}.mnemophonix.{self.run_id}_{stage}"

    def write(self, stage: str, df: DataFrame,
              input_fingerprint: str | None = None) -> dict:
        """Materialize a stage; returns the lineage record."""
        t0 = time.time()
        if self._catalog:
            df.writeTo(self._table(stage)).createOrReplace()
            n = self.spark.table(self._table(stage)).count()
            lineage = {"stage": stage, "rows": n, "secs": time.time() - t0,
                       "backend": "iceberg",
                       "input_fingerprint": input_fingerprint}
            return lineage
        root = self._stage_root(stage)
        os.makedirs(root, exist_ok=True)
        prev = self._current_version(stage)
        # immutable version dir: unique name, never referenced until the
        # pointer swap, so concurrent readers of the committed version
        # are untouched while this writes
        vname = f"v{time.time_ns()}_{os.getpid()}"
        vdir = os.path.join(root, vname)
        df.write.mode("overwrite").parquet(vdir)
        # per-partition lineage: rows per output file
        written = self.spark.read.parquet(vdir)
        from pyspark.sql import functions as F

        per_file = (
            written.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        n = sum(r["count"] for r in per_file)
        lineage = {
            "stage": stage,
            "version": vname,
            "rows": n,
            "secs": round(time.time() - t0, 3),
            "backend": "parquet",
            "input_fingerprint": input_fingerprint,
            "partitions": [
                {"file": os.path.basename(r["file"]), "rows": r["count"]}
                for r in sorted(per_file, key=lambda r: r["file"])
            ],
        }
        # marker inside the version dir (underscore-prefixed: invisible
        # to the parquet reader), then the atomic pointer swap publishes
        # the snapshot — rename-over-file is atomic on POSIX
        with open(os.path.join(vdir, "_LINEAGE.json"), "w") as f:
            json.dump(lineage, f)
        ptr_tmp = self._pointer(stage) + f".tmp.{os.getpid()}"
        with open(ptr_tmp, "w") as f:
            f.write(vname)
        os.replace(ptr_tmp, self._pointer(stage))  # commit
        # GC: drop versions older than the PREVIOUS one (kept so readers
        # that resolved the old snapshot before the swap stay valid)
        keep = {vname, os.path.basename(prev) if prev else None}
        for entry in os.listdir(root):
            if entry.startswith("v") and entry not in keep:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
        return lineage

    def read(self, stage: str) -> DataFrame:
        if self._catalog:
            return self.spark.table(self._table(stage))
        vdir = self._current_version(stage)
        if vdir is None:
            raise FileNotFoundError(f"stage {stage!r} has no committed version")
        return self.spark.read.parquet(vdir)

    def run_stage(self, stage: str, build, input_fingerprint: str | None = None,
                  log=print) -> DataFrame:
        """Compute-or-resume: skip ``build`` when stage is committed."""
        if self.is_committed(stage, input_fingerprint):
            log(f"[resume] stage {stage!r} already committed; skipping")
            return self.read(stage)
        lineage = self.write(stage, build(), input_fingerprint)
        log(f"[commit] stage {stage!r}: {lineage['rows']} rows "
            f"in {lineage['secs']}s ({lineage['backend']})")
        return self.read(stage)

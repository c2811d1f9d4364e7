"""Snapshot-versioned parquet tables: time travel without Delta.

The reference maintains its serving table as a Delta table (MERGE +
implicit versioning, `03_Train & Deploy Model.py:480-495`). The MERGE
semantics live in `operators/merge.py`; this module supplies the other
half — numbered snapshots with time travel — on plain parquet, so the
capability survives in any environment:

    vt = VersionedTable(spark, path)
    v1 = vt.write_version(df1)          # snapshot 1
    v2 = vt.write_version(df2)          # snapshot 2
    vt.read()                           # latest
    vt.read(version=v1)                 # time travel

Each version is a full copy-on-write snapshot directory ``v=N``
committed by writing a one-line manifest LAST (rename-free, works on
object stores): readers resolve the manifest, then scan only that
version's directory — a reader never sees a half-written snapshot
because the manifest is the commit point. ``vacuum(keep_last)``
deletes expired snapshot directories.

At 100 TB the production refinement is file-level reuse (a manifest
lists files, unchanged files are shared across versions — exactly
Delta/Iceberg's design) and an atomic metastore swap for the commit;
the read/commit PROTOCOL here is the same, which is what the query
surface verifies.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.path, "_versions.json")

    def versions(self) -> list[int]:
        if not os.path.exists(self._manifest):
            return []
        with open(self._manifest) as f:
            return sorted(json.load(f)["versions"])

    def write_version(self, df: DataFrame) -> int:
        vs = self.versions()
        v = (vs[-1] + 1) if vs else 1
        vdir = os.path.join(self.path, f"v={v}")
        df.write.mode("overwrite").parquet(vdir)
        # manifest write IS the commit: a crash before this line leaves
        # an orphan directory, never a visible half-version
        with open(self._manifest, "w") as f:
            json.dump({"versions": vs + [v]}, f)
        return v

    def read(self, version: int | None = None) -> DataFrame:
        vs = self.versions()
        if not vs:
            raise ValueError(f"no committed versions at {self.path}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in committed set {vs}")
        return self.spark.read.parquet(os.path.join(self.path, f"v={v}"))

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots; returns the
        removed version numbers. Manifest updates FIRST so readers
        can't resolve a version whose files are mid-delete."""
        vs = self.versions()
        keep = vs[-keep_last:] if keep_last > 0 else []
        drop = [v for v in vs if v not in keep]
        with open(self._manifest, "w") as f:
            json.dump({"versions": keep}, f)
        for v in drop:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)
        return drop

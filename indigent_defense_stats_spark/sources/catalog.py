"""Snapshot-versioned parquet tables with Iceberg-like semantics.

The north rule calls for Iceberg checkpointing of frontier state,
lineage and metrics per wave.  This sandbox has no Iceberg runtime
jars, so this module provides the same *semantics* on plain parquet:

- atomic snapshots (write to tmp dir + rename; a manifest JSON commits
  the snapshot)
- overwrite tables (full state per snapshot: frontier, host_state) and
  append tables (delta per snapshot, union on read: documents, logs,
  metrics)
- time travel (``read(snapshot=k)``) and resume-from-latest

On a production cluster every ``SnapshotTable`` call site maps 1:1 to
``df.writeTo(table).overwritePartitions()/.append()`` plus Iceberg
snapshot reads; nothing else in the engine would change.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: StructType | None = None,
        mode: str = "overwrite",  # 'overwrite' | 'append'
    ) -> None:
        assert mode in ("overwrite", "append")
        self.spark = spark
        self.path = path
        self.schema = schema
        self.mode = mode
        os.makedirs(path, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------
    def _snap_dir(self, snap: int) -> str:
        return os.path.join(self.path, f"snap-{snap:05d}")

    def _manifest(self, snap: int) -> str:
        return os.path.join(self._snap_dir(snap), "_manifest.json")

    def snapshots(self) -> list[int]:
        out = []
        for d in sorted(os.listdir(self.path)):
            # strict name match: a crash between the manifest write and
            # the commit rename leaves snap-NNNNN.tmp (which contains a
            # manifest!) — it must parse as "not a snapshot", not crash
            if (
                d.startswith("snap-")
                and d[5:].isdigit()
                and os.path.exists(os.path.join(self.path, d, "_manifest.json"))
            ):
                out.append(int(d[5:]))
        return out

    def latest(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # -- io -------------------------------------------------------------------
    def write(self, df: DataFrame, meta: dict | None = None) -> int:
        snap = (self.latest() or 0) + 1
        target = self._snap_dir(snap)
        tmp = target + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        os.makedirs(tmp, exist_ok=True)
        manifest = {
            "snapshot": snap,
            "parent": self.latest(),
            "ts": time.time(),
            "mode": self.mode,
            **(meta or {}),
        }
        # write manifest inside tmp, then atomic rename commits the snapshot
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, target)
        return snap

    def read(self, snapshot: int | None = None) -> DataFrame | None:
        snaps = self.snapshots()
        if not snaps:
            return None
        upto = snapshot if snapshot is not None else snaps[-1]
        if self.mode == "overwrite":
            if upto not in snaps:
                return None
            return self.spark.read.parquet(
                os.path.join(self._snap_dir(upto), "data")
            )
        paths = [
            os.path.join(self._snap_dir(s), "data") for s in snaps if s <= upto
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def read_or_empty(self, snapshot: int | None = None) -> DataFrame:
        df = self.read(snapshot)
        if df is None:
            assert self.schema is not None, "empty read needs a schema"
            return self.spark.createDataFrame([], self.schema)
        return df

    def manifest(self, snapshot: int) -> dict:
        with open(self._manifest(snapshot)) as f:
            return json.load(f)

    def drop_snapshots(self, pred) -> int:
        """Remove snapshots whose manifest matches *pred* (a dict ->
        bool callable).  Used for resume-time cleanup of torn writes —
        the plain-parquet stand-in for aborting an uncommitted Iceberg
        transaction."""
        dropped = 0
        for s in self.snapshots():
            if pred(self.manifest(s)):
                shutil.rmtree(self._snap_dir(s), ignore_errors=True)
                dropped += 1
        return dropped

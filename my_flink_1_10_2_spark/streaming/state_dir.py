"""Bounded-growth parquet state for forever-stateful micro-batch ops.

The retraction join and the early-fire replay accumulate state as one
parquet directory per micro-batch.  Unbounded, that is the classic
small-file death: after B batches a state read lists O(B) directories
and O(B·partitions) files — at 100 TB the metadata alone dominates.
This module is the compaction/snapshot policy (the state-side analog of
``operators/compaction.py``; ref: the reference's RocksDB state backend
compacts SST levels for exactly this reason —
flink-state-backends/flink-statebackend-rocksdb/):

- every batch write OVERWRITES a batch-indexed subdir (``b<idx>``) —
  a redelivered micro-batch rewrites identical bytes instead of
  double-appending (at-least-once safety, the round-4/5 lesson);
- a MANIFEST.json names the live subdirs and is replaced atomically
  (``os.replace``; on HDFS rename is atomic too — for object stores
  swap in a conditional put), so readers never see a half-compacted
  state;
- every ``compact_every`` batches the live dirs fold into ONE snapshot
  (``c<idx>``, sized by ``plan_target_files``), the manifest flips to
  it, and superseded/orphaned subdirs are deleted best-effort — crash
  anywhere and the manifest still names a complete, consistent state.

File count is therefore bounded by ``compact_every × files_per_batch +
snapshot files`` regardless of how many batches ever ran.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from my_flink_1_10_2_spark.operators.compaction import plan_target_files


class StateDir:
    """Manifest-governed parquet state directory with periodic
    fold-into-snapshot compaction.  Single-writer (the foreachBatch
    driver loop — the same serialization the reference's per-operator
    state ownership gives); reads are ordinary distributed scans."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema,
        *,
        compact_every: int = 16,
        target_file_bytes: int = 128 * 1024 * 1024,
    ):
        if compact_every < 2:
            raise ValueError("compact_every must be >= 2")
        self.spark = spark
        self.path = path.rstrip("/")
        self.schema = schema
        self.compact_every = compact_every
        self.target_file_bytes = target_file_bytes
        os.makedirs(self.path, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    @property
    def _manifest(self) -> str:
        return f"{self.path}/MANIFEST.json"

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest):
            return {"dirs": [], "applied": -1}
        with open(self._manifest) as f:
            return json.load(f)

    def live_dirs(self) -> list[str]:
        return self._read_manifest()["dirs"]

    def applied_index(self) -> int:
        """Highest batch index durably absorbed into the state."""
        return self._read_manifest()["applied"]

    def _write_manifest(self, dirs: list[str], applied: int) -> None:
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"dirs": dirs, "applied": applied}, f)
        os.replace(tmp, self._manifest)  # atomic flip

    # -- read / write ----------------------------------------------------------

    def read(self) -> DataFrame:
        dirs = self.live_dirs()
        if not dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(
            *[f"{self.path}/{d}" for d in dirs]
        )

    def write_batch(self, df: DataFrame, index: int) -> None:
        """Persist one micro-batch's state delta under batch ``index``.

        Idempotent under at-least-once redelivery: ``applied`` is the
        highest index durably in the manifest — a redelivered batch
        (index <= applied) is a no-op even if its subdir has since been
        folded into a compaction snapshot (re-adding it would double the
        rows).  A fresh index overwrites its subdir (a half-written
        earlier attempt never made the manifest) and flips the manifest
        atomically."""
        m = self._read_manifest()
        if index <= m["applied"]:
            return  # already absorbed (possibly compacted away)
        dname = f"b{index:08d}"
        df.write.mode("overwrite").parquet(f"{self.path}/{dname}")
        dirs = m["dirs"] + [dname]
        self._write_manifest(dirs, index)
        if len(dirs) >= self.compact_every:
            self._compact(index)

    # -- compaction -------------------------------------------------------------

    def _compact(self, index: int) -> None:
        """Fold every live dir into one snapshot; flip the manifest;
        delete everything the manifest no longer names.  Deterministic
        snapshot name per index → a redelivered compaction overwrites
        the same snapshot with the same bytes."""
        snap = f"c{index:08d}"
        live = self.live_dirs()
        total = 0
        for d in live:
            for root, _dirs, files in os.walk(f"{self.path}/{d}"):
                total += sum(
                    os.path.getsize(os.path.join(root, fn))
                    for fn in files
                    if fn.endswith(".parquet")
                )
        n_out = plan_target_files(max(total, 1), self.target_file_bytes)
        folded = self.spark.read.schema(self.schema).parquet(
            *[f"{self.path}/{d}" for d in live]
        )
        folded.repartition(n_out).write.mode("overwrite").parquet(
            f"{self.path}/{snap}"
        )
        self._write_manifest([snap], index)
        # best-effort cleanup of superseded dirs AND orphans from earlier
        # crashes — anything not in the manifest is dead by definition
        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if (
                os.path.isdir(full)
                and entry != snap
                and entry[:1] in ("b", "c")
            ):
                shutil.rmtree(full, ignore_errors=True)

    def file_count(self) -> int:
        """Total files under the state dir (tests pin boundedness)."""
        n = 0
        for _root, _dirs, files in os.walk(self.path):
            n += len(files)
        return n

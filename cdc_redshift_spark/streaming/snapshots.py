"""Shared versioned-snapshot commit discipline for streaming
maintainers (``RollupMaintainer``, ``Scd2Maintainer``): the
write-new-then-swap layout of ``ParquetSink`` keyed by BATCH ID, so a
foreachBatch retry of an already-committed batch no-ops.

Layout:  ``path/v<batch_id>/part-*.parquet`` + ``path/_LATEST``
containing the committed batch id (atomic ``os.replace`` pointer
flip); snapshots beyond ``keep_versions`` are pruned on commit, the
previous one always kept so a reader holding the old pointer still
resolves.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class VersionedSnapshotStore:
    """Mixin: requires ``self.spark``, ``self.path``,
    ``self.keep_versions`` set by the subclass __init__."""

    spark: SparkSession
    path: str
    keep_versions: int

    def committed_batch(self) -> int | None:
        ptr = os.path.join(self.path, "_LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def current(self) -> DataFrame | None:
        v = self.committed_batch()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def _commit(self, state: DataFrame, batch_id: int) -> None:
        vdir = os.path.join(self.path, f"v{batch_id}")
        state.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(self.path, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(self.path, "_LATEST"))
        # prune old snapshots beyond keep_versions (the previous one is
        # kept so a reader holding the old pointer still resolves)
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        )
        for v in versions[: -self.keep_versions]:
            shutil.rmtree(
                os.path.join(self.path, f"v{v}"), ignore_errors=True
            )

"""Shared versioned-snapshot commit discipline for streaming
maintainers (``RollupMaintainer``, ``Scd2Maintainer``): the
write-new-then-swap layout of ``ParquetSink`` keyed by BATCH ID, so a
foreachBatch retry of an already-committed batch no-ops.

Layout:  ``path/v<batch_id>/part-*.parquet`` + ``path/_LATEST``
containing the committed batch id (atomic ``os.replace`` pointer
flip); snapshots beyond ``keep_versions`` are pruned on commit, the
previous one always kept so a reader holding the old pointer still
resolves.

Bucketed mode (``bucket_keys`` + ``n_buckets`` set by the subclass):
the snapshot is stored hash-partitioned on the state keys —
``path/v<id>/__bucket=<pmod(xxhash64(keys), n)>/part-*.parquet`` —
so a maintainer whose state GROWS with history (the SCD2 dimension
history) can commit a trigger by rewriting only the buckets the
batch touches and HARD-LINKING every untouched bucket's files
forward from the previous version (the same inode-pinned discipline
as ``ParquetSink._apply_pruned``).  Per-trigger IO becomes
O(touched buckets + batch), not O(stored history); version pruning
stays safe because removing an old version dir only unlinks names —
inodes shared with newer versions survive.  ``n_buckets`` is pinned
in ``path/_BUCKETS`` at first commit so a restart with a different
constructor value cannot silently mis-route pruned reads.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: partition column for bucketed snapshots — "__" prefix keeps it out
#: of the user column namespace (same convention as the planner's
#: reserved stats entries); ``current()`` never leaks it to readers.
BUCKET_COL = "__bucket"


class VersionedSnapshotStore:
    """Mixin: requires ``self.spark``, ``self.path``,
    ``self.keep_versions`` set by the subclass __init__.  Subclasses
    wanting bucketed commits also set ``self.bucket_keys``
    (state key columns) and ``self.n_buckets``."""

    spark: SparkSession
    path: str
    keep_versions: int
    #: key columns the bucketed layout hashes on (None = unbucketed)
    bucket_keys: list[str] | None = None
    #: bucket count for NEW stores; an existing store's _BUCKETS pin wins
    n_buckets: int = 0

    def committed_batch(self) -> int | None:
        ptr = os.path.join(self.path, "_LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def current(self, buckets: list[int] | None = None) -> DataFrame | None:
        """The committed snapshot (None before the first commit).

        ``buckets``: restrict a BUCKETED snapshot to these bucket ids
        — a partition-pruned read (only those buckets' files are
        listed/scanned).  The internal :data:`BUCKET_COL` never
        reaches the caller either way."""
        v = self.committed_batch()
        if v is None:
            return None
        df = self.spark.read.parquet(os.path.join(self.path, f"v{v}"))
        if BUCKET_COL in df.columns:
            if buckets is not None:
                # filter on the partition column BEFORE dropping it:
                # Catalyst prunes the file listing at planning time
                df = df.where(F.col(BUCKET_COL).isin([int(b) for b in buckets]))
            df = df.drop(BUCKET_COL)
        return df

    # -- bucketed-mode helpers ---------------------------------------------

    def _bucket_count(self) -> int:
        """The store's pinned bucket count: ``_BUCKETS`` if the store
        has committed before (the layout on disk wins over the
        constructor — a mismatched restart must not mis-route pruned
        reads), else the constructor value (pinned at first commit)."""
        pin = os.path.join(self.path, "_BUCKETS")
        if os.path.exists(pin):
            with open(pin) as f:
                return int(f.read().strip())
        return int(self.n_buckets)

    def _bucket_expr(self):
        """Deterministic bucket id of a row's state key:
        ``pmod(xxhash64(keys), n)`` — stable across sessions (xxhash64
        is seed-fixed), recomputable on both the batch and the stored
        side so pruning can never disagree with placement."""
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.bucket_keys]),
            F.lit(self._bucket_count()),
        ).cast("int")

    def touched_buckets(self, batch: DataFrame) -> list[int]:
        """The bucket ids a batch's keys land in — a bounded collect
        (<= n_buckets values, metadata-sized by construction)."""
        return sorted(
            r[0]
            for r in batch.select(self._bucket_expr().alias("b"))
            .distinct()
            .collect()
        )

    def _commit(self, state: DataFrame, batch_id: int) -> None:
        """Full-state commit: write everything, flip the pointer.
        Bucketed stores still partition the layout (so the NEXT
        commit can prune/link), and pin ``_BUCKETS`` on first use."""
        vdir = os.path.join(self.path, f"v{batch_id}")
        if self.bucket_keys and self.n_buckets:
            self._pin_buckets()
            self._write_bucketed(state, vdir)
            self._ensure_readable(vdir, state)
        else:
            state.write.mode("overwrite").parquet(vdir)
        self._flip(batch_id)

    def _commit_pruned(
        self,
        touched_state: DataFrame,
        batch_id: int,
        touched: list[int],
        prev_batch: int,
    ) -> None:
        """Bucketed incremental commit: write ONLY the touched
        buckets' new state, hard-link every other bucket's files
        forward from version ``prev_batch``, flip the pointer.  IO is
        O(touched state) + O(#untouched files) link syscalls — the
        stored history's bytes are never re-read or re-written.

        ``touched_state`` must hold exactly the touched buckets' full
        new state (the caller read those buckets, merged the batch,
        and hands the result back); rows are re-bucketed here from
        the key columns, so placement cannot drift from pruning."""
        vdir = os.path.join(self.path, f"v{batch_id}")
        self._write_bucketed(
            touched_state, vdir, n_parts=max(len(touched), 1)
        )
        prev = os.path.join(self.path, f"v{prev_batch}")
        touched_dirs = {f"{BUCKET_COL}={int(b)}" for b in touched}
        for d in os.listdir(prev):
            if not d.startswith(f"{BUCKET_COL}=") or d in touched_dirs:
                continue
            src, dst = os.path.join(prev, d), os.path.join(vdir, d)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if fn.startswith((".", "_")):
                    continue
                os.link(os.path.join(src, fn), os.path.join(dst, fn))
        self._ensure_readable(vdir, touched_state)
        self._flip(batch_id)

    def _write_bucketed(
        self, state: DataFrame, vdir: str, n_parts: int | None = None
    ) -> None:
        """Bucket-partitioned snapshot write, repartitioned ON the
        bucket id first so each bucket directory holds ~one file —
        without this every upstream shuffle task writes a file per
        bucket it happens to hold (O(tasks x buckets) small files,
        which at scale bloats both the link pass and every pruned
        read's listing).  The repartition shuffles only the state
        being written; pruned commits pass ``n_parts`` ~= the touched
        bucket count so a 4096-bucket store doesn't launch 4096
        near-empty write tasks for a 3-bucket trigger (bucket-id hash
        collisions just mean one task writes two directories)."""
        df = state.withColumn(BUCKET_COL, self._bucket_expr())
        (
            df.repartition(
                n_parts or self._bucket_count(), F.col(BUCKET_COL)
            )
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(vdir)
        )

    def _ensure_readable(self, vdir: str, state: DataFrame) -> None:
        """A ``partitionBy`` write of an EMPTY frame emits no
        schema-bearing file (only ``_SUCCESS``), unlike a plain
        parquet write — so a batch that empties the whole state (all
        groups retracted) would leave a version ``spark.read`` cannot
        infer a schema from, permanently wedging the store (review
        r11, reproduced).  If the new version holds no data file at
        all (empty write AND nothing hard-linked), fall back to a
        plain empty write: it carries the schema in a metadata-only
        part file, reads back as zero rows, and — being UNBUCKETED —
        makes the next commit take the full (bootstrap-style) path,
        which re-buckets.  Self-healing by construction."""
        for root, _dirs, files in os.walk(vdir):
            if any(not f.startswith((".", "_")) for f in files):
                return
        state.limit(0).drop(BUCKET_COL).write.mode("overwrite").parquet(vdir)

    def _pin_buckets(self) -> None:
        pin = os.path.join(self.path, "_BUCKETS")
        if not os.path.exists(pin):
            tmp = pin + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(int(self.n_buckets)))
            os.replace(tmp, pin)

    def _bucketed_on_disk(self) -> bool:
        """Whether the COMMITTED version is bucket-partitioned (an
        unbucketed store adopted mid-stream takes one full commit to
        migrate; until then pruned commits must not link)."""
        v = self.committed_batch()
        if v is None:
            return False
        vdir = os.path.join(self.path, f"v{v}")
        return any(
            d.startswith(f"{BUCKET_COL}=") for d in os.listdir(vdir)
        )

    def _flip(self, batch_id: int) -> None:
        tmp = os.path.join(self.path, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(self.path, "_LATEST"))
        # prune old snapshots beyond keep_versions (the previous one is
        # kept so a reader holding the old pointer still resolves;
        # hard-linked files survive — rmtree only unlinks names)
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        )
        for v in versions[: -self.keep_versions]:
            shutil.rmtree(
                os.path.join(self.path, f"v{v}"), ignore_errors=True
            )

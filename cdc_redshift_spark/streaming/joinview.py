"""Streaming equi-join view maintenance: a materialized join view
kept fresh from signed micro-batch deltas — the streaming face of
``operators/incremental.join_view_delta`` / ``apply_view_delta``,
wired to the same versioned write-new-then-swap commit discipline as
``RollupMaintainer`` / ``Scd2Maintainer``.

Per batch this costs two delta-broadcast joins (``dL ⋈ R_old`` and
``L_new ⋈ dR`` — neither shuffles the big tables) plus one groupBy
merge over the TOUCHED key-hash buckets of the stored view; the view
is NEVER recomputed from the base tables.  Since round 11 the store
is bucket-partitioned on the join keys (when they appear in the view
projection): a trigger partition-prune-reads only the buckets the
delta's keys hash into, merges, rewrites those, and hard-links every
untouched bucket forward — per-trigger compute AND IO are
O(touched + delta) however large the view grows, the same discipline
as ``Scd2Maintainer``.  Bootstrap needs no special case: starting from the empty
view, a first batch of ``dL = L(+1), dR = R(+1), R_old = ∅`` makes
``L_new ⋈ dR`` the full join — initial load IS the algebra.

Replay-safe exactly like the other maintainers: a batch id at or
below the committed version no-ops (foreachBatch retries the same id
after a crash), and snapshots beyond ``keep_versions`` are pruned on
every commit, so a continuous stream cannot grow unbounded version
directories.  Wire into :class:`CdcPipeline` via ``on_raw_batch``,
deriving the four frames from the batch's change images and the
stored base-table snapshots (``ParquetSink.read_table``).

At 100 TB: both deltas are micro-batch-small and broadcast
(plan-pinned in tests/test_plan_quality.py for the batch operator);
with the fact stored bucketed by join key, pass ``left_new`` pruned
to the delta's key buckets so the fact scan touches only matching
partitions (SCALE.md round-6: 1/64 files measured).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.incremental import (
    apply_view_delta,
    join_view_delta,
)
from cdc_redshift_spark.streaming.snapshots import AUTO, VersionedSnapshotStore


class JoinViewMaintainer(VersionedSnapshotStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        on: list[str],
        cols: list[str],
        cnt_col: str = "cnt",
        keep_versions: int = 2,
        n_buckets: int | str = 64,
        target_bucket_bytes: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.on = list(on)
        self.cols = list(cols)
        self.cnt_col = cnt_col
        self._set_keep_versions(keep_versions)
        # bucketed snapshot layout (VersionedSnapshotStore), keyed on
        # the JOIN columns: a delta can only change view images whose
        # join keys it carries, so a trigger reads/rewrites only the
        # delta's key-hash buckets and hard-links the rest — the same
        # bounded-IO discipline as Scd2Maintainer (round 11).  Needs
        # the join keys IN the view projection (they identify the
        # image's bucket on both the read and the write side);
        # otherwise, or with n_buckets=0, every commit is a full
        # rewrite as before.  n_buckets="auto" sizes the count from
        # state bytes at first commit and grows it geometrically via
        # maybe_rebucket().
        self.bucket_keys = (
            list(on) if n_buckets and set(on) <= set(cols) else None
        )
        self.n_buckets = n_buckets if n_buckets == AUTO else int(n_buckets)
        self._set_target_bucket_bytes(target_bucket_bytes)
        os.makedirs(path, exist_ok=True)

    def update(
        self,
        d_left: DataFrame,
        left_new: DataFrame,
        d_right: DataFrame,
        right_old: DataFrame,
        batch_id: int,
    ) -> bool:
        """Fold one micro-batch of signed base-table deltas into the
        stored view (bag semantics: ``cols..., cnt``).  Frames follow
        :func:`join_view_delta`'s contract — deltas carry a ``sign``
        column (+1 insert image / -1 delete image), ``left_new`` is
        the left table AFTER this batch, ``right_old`` the right
        table BEFORE it.  Returns False (no-op) when ``batch_id`` was
        already committed — the replay-idempotence path."""
        last = self.committed_batch()
        if last is not None and batch_id <= last:
            return False
        delta = join_view_delta(
            d_left, left_new, d_right, right_old, on=self.on, cols=self.cols
        )
        # bucketed stores read only the buckets the delta's join keys
        # touch: a view image's count changes only when the delta
        # carries that exact image, whose keys land in a touched
        # bucket — so the prune is semantics-free, and the negative-
        # count drift guard still sees every row it could fire on.
        # Touched buckets come from the RAW delta inputs' key
        # projections (micro-batch-small), NOT from `delta`:
        # evaluating the joined delta here and again at commit time
        # would run both IVM joins — including the fact-side scan —
        # twice per trigger (review r11).  Every `delta` row's keys
        # appear in d_left or d_right by construction (part1 keys
        # come from dL, part2 keys from dR), so the cover is exact.
        pruned = self.bucket_keys and self._bucketed_on_disk()
        touched = (
            self.touched_buckets(
                d_left.select(*self.on).unionByName(
                    d_right.select(*self.on)
                )
            )
            if pruned
            else None
        )
        view = self.current(buckets=touched)
        if view is None:  # empty view: bootstrap via the algebra itself
            view = (
                delta.select(*self.cols)
                .limit(0)
                .withColumn(self.cnt_col, F.lit(0).cast("long"))
            )
        new_view = apply_view_delta(
            view, delta, self.cols, cnt_col=self.cnt_col
        )
        if pruned:
            self._commit_pruned(new_view, batch_id, touched, last)
        else:
            self._commit(new_view, batch_id)
        return True

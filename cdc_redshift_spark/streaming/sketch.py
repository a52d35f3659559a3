"""Streaming sketch maintenance: a Count-Min frequency sketch kept
fresh from the event stream itself.

The batch form (``operators/sketches.cm_sketch``) answers "how often
does key X occur in this table"; at 100 TB the question is usually
asked of an UNBOUNDED stream, where re-sketching the history per
trigger is a full rescan.  CM cells are elementwise-additive, so the
maintainer folds each micro-batch's d x w-bounded delta sketch into
the stored one — per batch cost is O(batch) + O(d*w), never
O(history) — under the same versioned write-new-then-swap commit and
batch-id replay guard as :class:`RollupMaintainer` (foreachBatch
retries become exactly-once no-ops).

Append-only by design: CM counts model an insert stream (events,
ingested documents).  A retraction-bearing CDC stream would fold
SIGNED cells the way ``rollup_delta_signed`` does — same algebra,
kept out until a consumer needs it (estimates from a sketch with
in-flight negative cells are not monotone upper bounds).

Wire into a pipeline via ``on_raw_batch``:

    m = CmSketchMaintainer(spark, path, prepare=lambda b: b.select(
            F.col("user_id").alias("key")))
    CdcPipeline(..., on_raw_batch=lambda bid, raw: m.update(raw, bid))
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_redshift_spark.operators.sketches import (
    CM_D,
    CM_W,
    cm_merge,
    cm_sketch,
)
from cdc_redshift_spark.streaming.snapshots import VersionedSnapshotStore


class CmSketchMaintainer(VersionedSnapshotStore):
    """Maintains one Count-Min sketch from append micro-batches.

    ``prepare`` maps a raw batch to one row per stream element with a
    ``key`` column (select/cast/filter — e.g. payload extraction).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        prepare: Callable[[DataFrame], DataFrame],
        d: int = CM_D,
        w: int = CM_W,
        keep_versions: int = 2,
    ):
        self.spark = spark
        self.path = path
        self.prepare = prepare
        self.d = d
        self.w = w
        self._set_keep_versions(keep_versions)
        os.makedirs(path, exist_ok=True)

    def update(self, batch: DataFrame, batch_id: int) -> bool:
        """Fold one micro-batch into the sketch.  Returns False (no-op)
        when ``batch_id`` was already committed — the replay path."""
        last = self.committed_batch()
        if last is not None and batch_id <= last:
            return False
        delta = cm_sketch(self.prepare(batch), "key", d=self.d, w=self.w)
        stored = self.current()
        merged = delta if stored is None else cm_merge(stored, delta)
        self._commit(merged, batch_id)
        return True


class KmvSketchMaintainer(VersionedSnapshotStore):
    """Maintains per-group KMV distinct sketches from append
    micro-batches — the continuous form of the month-over-distinct
    question (``operators/sketches.kmv_sketch``): COUNT(DISTINCT) is
    not incrementally maintainable as a scalar, but the k-minimum-
    values sketch merges LOSSLESSLY (the global k minima are always
    contained in the union of per-part k minima), so folding each
    batch's per-group sketch into the stored one yields BIT-IDENTICAL
    state to sketching the whole history — the property the gate
    certifies against the batch SQL mirror.  Per batch cost:
    O(batch) + one k-long array per touched group.

    ``prepare`` maps a raw batch to rows carrying ``dims`` + ``col``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        prepare: Callable[[DataFrame], DataFrame],
        dims: list[str] | tuple[str, ...],
        col: str,
        k: int = 256,
        keep_versions: int = 2,
    ):
        self.spark = spark
        self.path = path
        self.prepare = prepare
        self.dims = list(dims)
        self.col = col
        self.k = k
        self._set_keep_versions(keep_versions)
        os.makedirs(path, exist_ok=True)

    def update(self, batch: DataFrame, batch_id: int) -> bool:
        from cdc_redshift_spark.operators.sketches import (
            kmv_merge,
            kmv_sketch,
        )

        last = self.committed_batch()
        if last is not None and batch_id <= last:
            return False
        delta = kmv_sketch(
            self.prepare(batch), self.dims, self.col, k=self.k
        )
        stored = self.current()
        if stored is None:
            merged = delta
        else:
            merged = kmv_merge(
                stored.select(*self.dims, "kmv").unionByName(
                    delta.select(*self.dims, "kmv")
                ),
                self.dims,
                k=self.k,
            ).drop("n_parts")
        self._commit(merged, batch_id)
        return True

"""Custom stateful streaming operators over the ChangeSet stream.

The reference's only streaming construct is a foreachBatch loop whose
per-batch dedup re-reads the warehouse for conflict resolution
(SURVEY §2.11).  These operators keep the resolution state IN the
stream instead, using Spark's keyed state store:

- :func:`stateful_lww_dedup` — continuous last-write-wins dedup via
  ``applyInPandasWithState``: per (db, table, key) the state holds the
  winning (ts_ms, offset); a micro-batch emits a key's row only when
  it beats everything seen in ANY earlier batch, so stale cross-batch
  replays are suppressed before they ever reach a sink, with no
  read-back of sink state.  State is checkpointed with the query and
  survives restarts; an optional processing-time TTL bounds state size
  once a source's max-lateness horizon has passed (the same contract
  as ParquetSink's tombstone expiry).
- :func:`windowed_op_counts` — event-time tumbling-window op counts
  with a watermark for late data: pure built-in window aggregation
  (watermark drops events later than the allowed delay and lets the
  store evict closed windows).

Scale: both operators shuffle once on their grouping key and keep
per-key state O(1) (two longs for LWW; one count row per open window).
At 100 TB the state store partitions across executors like any keyed
stream; TTL/watermark bound its growth.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: ChangeSet stream columns (the normalize_* output shape).
CHANGESET_SCHEMA = (
    "db string, table string, key string, ts_ms long, offset long, "
    "op string, payload string, ts_date date"
)

_STATE_SCHEMA = "ts_ms long, offset long"


def stateful_lww_dedup(
    changes: DataFrame,
    keys: Sequence[str] = ("db", "table", "key"),
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Continuous LWW dedup of a streaming ChangeSet (update mode).

    Emits, per micro-batch and key, the single winning event — and only
    if it beats the winner remembered from all previous batches.  The
    (ts_ms, offset) total order matches plans/merge.py, so downstream
    ``apply_changeset`` receives an already-monotonic delta stream and
    late cross-batch replays never surface (the in-stream equivalent of
    the sink's tombstone guard).

    ``state_ttl_ms`` sets a processing-time TTL after which an idle
    key's state is dropped — bound state once no event older than the
    source's lateness horizon can still arrive.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = None  # the batch's winning row (pandas Series)
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                if best is None or (row["ts_ms"], row["offset"]) > (
                    best["ts_ms"],
                    best["offset"],
                ):
                    best = row
        if best is None:
            return
        if state.exists:
            ts, off = state.get
            if (best["ts_ms"], best["offset"]) <= (ts, off):
                if state_ttl_ms is not None:
                    state.setTimeoutDuration(state_ttl_ms)
                return  # nothing in this batch beats the remembered winner
        state.update((int(best["ts_ms"]), int(best["offset"])))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield best.to_frame().T

    return changes.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        dedup,
        outputStructType=CHANGESET_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def windowed_op_counts(
    changes: DataFrame,
    window: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling-window op counts with late-data handling.

    (window, db, table, op, n) — the streaming analogue of the batch
    ``cdc_op_counts`` query.  The watermark lets the state store close
    windows older than ``watermark_delay`` and drops events arriving
    later than that, which bounds state at any scale.
    """
    return (
        changes.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("win"), "db", "table", "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "db",
            "table",
            "op",
            "n",
        )
    )

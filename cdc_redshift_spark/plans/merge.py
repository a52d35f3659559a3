"""Native Spark merge: apply a ChangeSet to a table state.

The reference delegates merge to Redshift SQL executed as connector
postactions (SURVEY §2.5):

- J1 delete-matching:  DELETE FROM target USING stage WHERE t.key=s.key
  (glue_docdb_redshift_cdc.py:183, glue_pg_redshift_cdc.py:182,
  glue_dms_redshift_cdc.py:114)
- J2 MERGE upsert:     MERGE INTO target USING stage ... REMOVE DUPLICATES
  (glue_dms_redshift_cdc.py:107)
- J3 delete+insert upsert transaction
  (glue_docdb_redshift_cdc.py:183-186, glue_pg_redshift_cdc.py:182-185)

Here the same semantics run natively so they are locally testable, and
with one fix: the reference is last-*batch*-wins (a late event in a
later batch overwrites a newer row — SURVEY §2.11); we are
last-*timestamp*-wins, with (ts_ms, offset) as the total order.

Implementation choice (scale): union + keyed reduce rather than
join-per-op.  One hash shuffle on the key; map-side combine via
``max_by``.  The alternative (left_anti join + union) shuffles both
sides twice for the same result.  When the changeset is a micro-batch
(small vs. target), Catalyst/AQE broadcast the small side of the
pre-partition-prune semi-join automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ops that remove the row from the target when they win.
DELETE_OP = "delete"


def apply_changeset(
    target: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str] = ("key",),
    ts_col: str = "ts_ms",
    tiebreak_col: str = "offset",
    op_col: str = "op",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Return the new table state after applying ``changes``.

    ``target`` rows must carry the same (ts_col, tiebreak_col) columns
    (persisted by the sink) so late-arriving older events lose.  A
    ``None``/empty target means first materialization.

    Winner per key = max by (ts, offset) over target-row ∪ change-rows;
    a winning ``delete`` removes the key.  This is exactly Redshift's
    ``MERGE`` with a ``WHEN MATCHED AND s.ts >= t.ts`` guard — the
    guard the reference lacks (SURVEY §7.3).

    ``keep_tombstones=True`` retains winning delete rows (op='delete')
    in the output instead of dropping them.  Sinks that store state
    across batches need this: without the tombstone, an older event for
    a deleted key arriving in a LATER batch finds no competitor and
    resurrects the key (micro-batch order is not event order — file
    sources and Kafka partitions both reorder).  Readers filter
    tombstones out; a compactor may expire them once the source's
    max-lateness horizon passes.
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes must carry an '{op_col}' column")

    if target is not None:
        # Existing rows compete as non-delete ops at their stored ts.
        t = target
        if op_col not in t.columns:
            t = t.withColumn(op_col, F.lit("load"))
        # Symmetric schema union: a column present on either side
        # survives as a typed null on the other.  Asymmetry here is a
        # data-loss bug — in the DMS path, payload schemas come from
        # sample-bounded inference, and a batch whose sample missed a
        # field must not drop that column from the whole table.
        c_types = dict(changes.dtypes)
        t_types = dict(t.dtypes)
        c = changes
        for name in t.columns:
            if name not in c_types:
                c = c.withColumn(name, F.lit(None).cast(t_types[name]))
        for name in changes.columns:
            if name not in t_types:
                t = t.withColumn(name, F.lit(None).cast(c_types[name]))
        cols = c.columns  # changes' order, then target-only extras
        pool = t.select(*cols).unionByName(c.select(*cols))
    else:
        cols = changes.columns
        pool = changes

    ordered = F.struct(F.col(ts_col), F.col(tiebreak_col))
    row = F.struct(*[F.col(c) for c in cols])
    winners = (
        pool.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(row, ordered).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols])
    )
    if keep_tombstones:
        return winners
    return winners.where(F.col(op_col) != DELETE_OP)


def split_upserts_deletes(
    changes: DataFrame, op_col: str = "op"
) -> tuple[DataFrame, DataFrame]:
    """Partition a deduped changeset into (upserts, deletes).

    Mirrors the reference's two-write path (non-deletes with MERGE
    postaction, then deletes with DELETE USING postaction —
    glue_dms_redshift_cdc.py:175-193).  Used by SQL-pushing sinks;
    the native path uses :func:`apply_changeset` directly.
    """
    upserts = changes.where(F.col(op_col) != DELETE_OP)
    deletes = changes.where(F.col(op_col) == DELETE_OP)
    return upserts, deletes

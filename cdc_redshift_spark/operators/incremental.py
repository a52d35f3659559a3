"""Incremental materialized-aggregate maintenance (continuous aggregates
under CDC).

The reference applies CDC changes to Redshift base tables and leaves all
aggregation to downstream warehouse SQL (SURVEY §0; postactions at
`/root/reference/src/glue_pg_redshift_cdc.py:178-191` only merge rows) —
so every dashboard rollup over a 100 TB base table is a full rescan even
when 0.01 % of rows changed.  These operators close that gap: maintain a
bucketed rollup *incrementally* from the changeset itself.

Two steps, each one bounded shuffle:

1. :func:`rollup_delta` — fold the changeset (rows tagged
   insert/delete; an update is the delete of the before-image plus the
   insert of the after-image, exactly the shape
   ``normalize.pg_changeset`` can emit from a Debezium ``before``/
   ``after`` envelope) into signed per-group deltas.  Shuffles ONLY the
   changed rows — at 100 TB that is the micro-batch, not the table.
2. :func:`apply_rollup_delta` — merge deltas into the stored rollup via
   union + re-aggregate: one shuffle of |rollup| + |delta| *group* rows
   (already tiny — one row per bucket×dims).  When the rollup is stored
   partitioned by bucket date (``sinks/parquet_sink.py`` swap-commit),
   only partitions that appear in the delta need rewriting — the same
   touched-partition discipline the CDC merge path uses.

Maintainable measures are COUNT and SUM — the group homomorphisms with
inverses, so deletes subtract exactly.  MIN/MAX and COUNT(DISTINCT) are
NOT incrementally maintainable under deletes without auxiliary state;
for distinct counts pair this with the mergeable sketches in
:mod:`cdc_redshift_spark.operators.sketches` (insert-only maintainable).
Use DECIMAL measure columns when exact replay equivalence matters:
decimal sums are associative, so base+delta equals a full recompute
bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: op-code vocabularies: "row removed" (Debezium 'd', our normalized
#: 'delete') vs "row image added" (insert/load/snapshot-read).  An op
#: outside BOTH vocabularies — most importantly a Debezium 'u'/'update'
#: single-image row, which CANNOT be folded without its before-image —
#: raises instead of silently drifting the rollup.
DELETE_OPS = ("delete", "d")
INSERT_OPS = ("insert", "load", "c", "i", "r")


def rollup_delta(
    changeset: DataFrame,
    time_col: str | None,
    bucket: str | None,
    dims: list[str] | tuple[str, ...],
    measures: dict[str, str],
    op_col: str = "op",
    n_col: str = "n",
) -> DataFrame:
    """Signed per-group aggregate deltas from a changeset.

    Parameters
    ----------
    changeset : one row per change image. ``op_col`` in DELETE_OPS ∪
        INSERT_OPS (case-insensitive) — updates must arrive as
        delete(before) + insert(after) pairs; a bare update op raises
        (its before-image is missing by construction).
    time_col / bucket : event-time column and ``date_trunc`` unit for
        the rollup bucket (``'hour'``, ``'day'``, ...).
    dims : extra grouping dimensions.
    measures : ``{output_name: source_column}`` summed measures.
    n_col : name of the maintained row-count measure.

    Returns one row per touched (bucket_ts, \\*dims) with signed
    ``n_col`` and measure deltas — the only shuffle is over changed
    rows, grouped map-side first (partial aggregation).
    """
    op = F.lower(F.col(op_col))
    sign = (
        F.when(op.isin(*DELETE_OPS), F.lit(-1))
        .when(op.isin(*INSERT_OPS), F.lit(1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "rollup_delta: op must be a delete/insert image "
                        "(updates arrive as delete-before + insert-after "
                        "pairs, or use rollup_delta_signed over a "
                        "retraction stream); got: "
                    ),
                    F.coalesce(F.col(op_col), F.lit("NULL")),
                )
            ).cast("int")
        )
    )
    return _signed_delta(
        changeset, sign, time_col, bucket, dims, measures, n_col
    )


def rollup_delta_signed(
    retractions: DataFrame,
    time_col: str | None,
    bucket: str | None,
    dims: list[str] | tuple[str, ...],
    measures: dict[str, str],
    sign_col: str = "sign",
    n_col: str = "n",
) -> DataFrame:
    """Like :func:`rollup_delta` but over an already-signed retraction
    stream (``normalize.normalize_pg_retractions``): ``sign_col`` is
    ±1 per image row.  Because retraction algebra commutes, the input
    needs no dedup and no ordering — any batch split yields the same
    merged rollup."""
    return _signed_delta(
        retractions, F.col(sign_col), time_col, bucket, dims, measures, n_col
    )


def _signed_delta(df, sign, time_col, bucket, dims, measures, n_col):
    aggs = [F.sum(sign).alias(n_col)] + [
        F.sum(sign * F.col(src)).alias(out) for out, src in measures.items()
    ]
    # time_col=None → a pure dimensional rollup (no time bucket); the
    # bucketed form requires the bucketing time to come from the ROW
    # IMAGE (so an update's retraction lands in the bucket it was
    # counted in), which is why it is the image payload's column, never
    # the change timestamp.
    keys = (
        [F.date_trunc(bucket, F.col(time_col)).alias("bucket_ts")]
        if time_col is not None
        else []
    )
    return df.groupBy(*keys, *dims).agg(*aggs)


def apply_rollup_delta(
    rollup: DataFrame,
    delta: DataFrame,
    dims: list[str] | tuple[str, ...],
    measures: list[str] | tuple[str, ...],
    n_col: str = "n",
) -> DataFrame:
    """Merge a signed delta into a stored rollup.

    Both inputs carry ``(bucket_ts, *dims, n_col, *measures)``.  Union
    + one re-aggregation: with the rollup bucketed/partitioned on the
    group key this co-locates without a wide shuffle, and AQE coalesces
    the tiny post-shuffle partitions.

    Cleanup rule: only groups that are IDENTICALLY zero (count and
    every measure) disappear — a fully-deleted bucket leaves no residue
    row (exact with DECIMAL measures).  Groups with a NEGATIVE count
    are kept: they are in-flight retractions whose matching inserts sit
    in a batch not yet applied (retraction algebra commutes across
    batch splits only if negative intermediate states survive the
    merge).  A converged rollup has no negative groups; readers that
    must tolerate mid-replay reads can filter ``n > 0`` themselves.
    """
    keys = (["bucket_ts"] if "bucket_ts" in rollup.columns else []) + list(
        dims
    )
    cols = [*keys, n_col, *measures]
    merged = rollup.select(*cols).unionByName(delta.select(*cols))
    out = merged.groupBy(*keys).agg(
        F.sum(n_col).alias(n_col),
        *[F.sum(m).alias(m) for m in measures],
    )
    return out.filter(_nonzero_group(n_col, measures))


def _nonzero_group(n_col: str, measures) -> "F.Column":
    """True for groups that carry any state: nonzero count or any
    nonzero measure.  (A group at count 0 whose measures are all 0 or
    NULL is identically empty — nothing left to retract or report.)"""
    cond = F.col(n_col) != 0
    for m in measures:
        cond = cond | (F.col(m) != 0)  # NULL-measure ⇒ no state
    return cond


def incremental_rollup(
    rollup: DataFrame,
    changeset: DataFrame,
    time_col: str | None,
    bucket: str | None,
    dims: list[str] | tuple[str, ...],
    measures: dict[str, str],
    op_col: str = "op",
    n_col: str = "n",
) -> DataFrame:
    """Convenience composition: ``apply_rollup_delta(rollup,
    rollup_delta(changeset, ...))``."""
    d = rollup_delta(
        changeset, time_col, bucket, dims, measures, op_col=op_col, n_col=n_col
    )
    return apply_rollup_delta(
        rollup, d, dims, list(measures), n_col=n_col
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    partition_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Per-partition change report between two snapshots of a table —
    the backfill planner: downstream recomputes touch ONLY partitions
    this report marks dirty, instead of diffing or rescanning 100 TB.

    Row-level semantics (full outer join on ``keys``):

    - key only in ``new``            → *added* (new row's partition)
    - key only in ``old``            → *deleted* (old row's partition)
    - both, any compare col differs (``IS DISTINCT FROM`` — null-safe)
      and partition unchanged        → *changed*
    - both, partition value moved    → *deleted* from the old partition
      AND *added* to the new one (both partitions are dirty)
    - otherwise                      → *unchanged*

    Output: ``partition, n_added, n_deleted, n_changed, n_unchanged``
    (one row per partition appearing in either snapshot).

    Plan: ONE full-outer shuffle join on the keys + one count
    aggregate on the partition value; with both snapshots bucketed by
    key (sinks/parquet_sink bucketing) the join is co-located.
    """
    o = old.select(
        *keys,
        F.col(partition_col).alias("__po"),
        F.struct(*compare_cols).alias("__vo"),
        F.lit(1).alias("__ino"),
    )
    n = new.select(
        *keys,
        F.col(partition_col).alias("__pn"),
        F.struct(*compare_cols).alias("__vn"),
        F.lit(1).alias("__inn"),
    )
    j = o.join(n, keys, "full_outer")
    moved = (
        F.col("__ino").isNotNull()
        & F.col("__inn").isNotNull()
        & ~F.col("__po").eqNullSafe(F.col("__pn"))
    )
    # each joined row contributes to one partition — except moves,
    # which contribute a delete to the old and an add to the new
    contrib = F.when(
        F.col("__ino").isNull(),
        F.array(F.struct(F.col("__pn").alias("p"), F.lit("added").alias("s"))),
    ).when(
        F.col("__inn").isNull(),
        F.array(
            F.struct(F.col("__po").alias("p"), F.lit("deleted").alias("s"))
        ),
    ).when(
        moved,
        F.array(
            F.struct(F.col("__po").alias("p"), F.lit("deleted").alias("s")),
            F.struct(F.col("__pn").alias("p"), F.lit("added").alias("s")),
        ),
    ).when(
        ~F.col("__vo").eqNullSafe(F.col("__vn")),
        F.array(
            F.struct(F.col("__pn").alias("p"), F.lit("changed").alias("s"))
        ),
    ).otherwise(
        F.array(
            F.struct(F.col("__pn").alias("p"), F.lit("unchanged").alias("s"))
        )
    )
    return (
        j.select(F.explode(contrib).alias("c"))
        .groupBy(F.col("c.p").alias("partition"))
        .agg(
            *[
                F.sum((F.col("c.s") == s).cast("long")).alias(f"n_{s}")
                for s in ("added", "deleted", "changed", "unchanged")
            ]
        )
    )


def snapshot_changes(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two snapshots — CDC *generation*,
    the inverse of ``plans/merge.apply_changeset``: the engine can now
    both APPLY a changeset to a table and EMIT the changeset two
    snapshots imply (Delta's ``table_changes`` shape, minus the log).

    Output: ``keys..., op ('insert'|'delete'|'update'), before
    struct, after struct`` — one row per changed key; unchanged keys
    (null-safe struct compare) produce nothing.

    Plan: the same ONE full-outer key join as :func:`snapshot_diff`;
    at 100 TB bucket both snapshots by key so it is co-located, and
    feed the output straight back through apply_changeset to replicate
    the table elsewhere.
    """
    o = old.select(
        *keys, F.struct(*compare_cols).alias("before"), F.lit(1).alias("__o")
    )
    n = new.select(
        *keys, F.struct(*compare_cols).alias("after"), F.lit(1).alias("__n")
    )
    return (
        o.join(n, keys, "full_outer")
        .withColumn(
            "op",
            F.when(F.col("__o").isNull(), F.lit("insert"))
            .when(F.col("__n").isNull(), F.lit("delete"))
            .when(
                ~F.col("before").eqNullSafe(F.col("after")), F.lit("update")
            )
            .otherwise(F.lit(None)),
        )
        .where(F.col("op").isNotNull())
        .select(*keys, "op", "before", "after")
    )

"""Golden-record survivorship: consolidate many partial observations
of an entity into ONE master record under field-level merge rules.

The master-data step that follows entity resolution (operators/joins
``fuzzy_name_join`` finds the matches; this merges them) and the
generalization of dedup's single-rule ``cluster_representatives``: each
output field picks its own survivorship rule — most-recent non-null,
longest non-null, majority vote, min/max/sum/count.  The reference
delegates the equivalent consolidation to Redshift post-action SQL
(SURVEY §2 K2); here it is a native one-pass aggregate.

Scale shape: every rule except ``mode`` folds into ONE map-side-
combined aggregate on the entity key (``max_by`` over an ordering
struct — no window, no self-join, no per-key sort).  Each ``mode``
field adds one (key, value)-grain count whose output is at most the
distinct pair count, then collapses to the key grain.  Nothing is
proportional to per-key history length except the scan itself.

Determinism: ties are broken explicitly — ``mode`` toward the highest
count then the GREATEST value, ``longest`` toward the greatest value
among equal lengths — so results are stable across partitionings and
mirror exactly in SQL (row_number windows on the DuckDB side).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule kinds taking a source column
_SIMPLE = {"max", "min", "sum"}
_ORDERED = {"latest", "earliest"}


def golden_record(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    rules: Mapping[str, tuple],
) -> DataFrame:
    """One golden row per key under per-field survivorship ``rules``.

    ``rules`` maps output field -> rule tuple:

    - ``("latest", col)`` / ``("earliest", col)``: the non-null value
      of ``col`` on the last/first row by ``order_cols`` (rows where
      ``col`` is null never win — the classic most-recent-non-null).
    - ``("longest", col)``: the longest non-null string (ties -> the
      greatest value).
    - ``("mode", col)``: the most frequent non-null value (ties -> the
      greatest value).
    - ``("max", col)`` / ``("min", col)`` / ``("sum", col)`` /
      ``("count",)``: plain aggregates.

    All non-``mode`` rules run in a single aggregate pass.
    """
    keys = list(key_cols)
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    aggs: list[Column] = []
    modes: list[tuple[str, str]] = []
    for out, rule in rules.items():
        kind = rule[0]
        c = F.col(rule[1]) if len(rule) > 1 else None
        if kind in _ORDERED:
            pick = F.max_by if kind == "latest" else F.min_by
            aggs.append(
                pick(c, F.when(c.isNotNull(), ord_struct)).alias(out)
            )
        elif kind == "longest":
            aggs.append(
                F.max_by(
                    c, F.when(c.isNotNull(), F.struct(F.length(c), c))
                ).alias(out)
            )
        elif kind in _SIMPLE:
            aggs.append(getattr(F, kind)(c).alias(out))
        elif kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "mode":
            modes.append((out, rule[1]))
        else:
            raise ValueError(f"golden_record: unknown rule kind {kind!r}")

    base = (
        df.groupBy(*keys).agg(*aggs)
        if aggs
        else df.select(*keys).distinct()
    )
    for out, col in modes:
        cnt = (
            df.where(F.col(col).isNotNull())
            .groupBy(*keys, col)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        mode = cnt.groupBy(*keys).agg(
            F.max_by(F.col(col), F.struct(F.col("__n"), F.col(col))).alias(
                out
            )
        )
        base = base.join(mode, keys, "left")
    # present fields in rule-declaration order regardless of how the
    # mode joins appended their columns
    return base.select(*keys, *rules.keys())

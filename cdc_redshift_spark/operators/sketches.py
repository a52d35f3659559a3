"""Mergeable cardinality sketches: KMV (k-minimum-values) and
Datasketches HLL.

Why this exists: COUNT(DISTINCT) is the one rollup measure that is
neither incrementally maintainable (operators/incremental.py) nor
re-aggregable from a finer rollup (``events_hourly_rollup``'s daily
re-aggregation works for count/sum/max, never for distinct).  At 100 TB
the standard move is to persist a small *mergeable sketch* per rollup
bucket and union sketches at query time — partial aggregation stays
map-side, re-aggregation is associative, and a month-over-distinct query
reads kilobytes instead of rescanning the base table.

Two implementations, deliberately complementary:

- **KMV** (`Bar-Yossef et al. 2002 <doi:10.1007/3-540-45726-7_1>`_):
  keep the ``k`` smallest values of a uniform hash; estimate
  ``(k-1) / theta_k`` where ``theta_k`` is the k-th minimum as a
  fraction of hash space.  Built on the same engine-stable 60-bit md5
  hash as the sampling/gram operators (``operators/corpus.py``), so the
  sketch bytes — and therefore the *estimate itself* — are reproducible
  bit-for-bit in DuckDB SQL.  That makes KMV the value-oracle-checkable
  form: the gate proves lossless mergeability (union of per-day minima
  == global minima), not just "close enough".
- **HLL** (Apache DataSketches via ``F.hll_sketch_agg``): the
  production-scale form — fixed 2^lgk bytes per group vs KMV's k×8 —
  kept for interop (the sketch bytes are the cross-system DataSketches
  format Redshift/Trino/Druid can also merge).  Its estimate is
  implementation-defined, so it gates through pytest tolerance + merge
  equality, not the SQL value oracle.

Scale notes: the sketch build is two bounded shuffles (distinct on
(dims, hash), then per-dims top-k via window — per-group state is O(k),
never a ``collect_set`` of the whole group).  Merges shuffle one row of
k longs per (bucket × dims) group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.corpus import stable_hash60

#: Hash-space size for the 60-bit stable hash (see stable_hash60).
HASH_SPACE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    dims: list[str] | tuple[str, ...],
    col: str,
    k: int = 256,
) -> DataFrame:
    """Per-``dims`` KMV sketch of ``col``: sorted array of the ``k``
    smallest distinct 60-bit hashes.

    Distinct first (one shuffle on (dims, hash) — map-side combined),
    then ``row_number`` per dims (second shuffle; per-group memory is
    one row, output capped at k rows per group before the final
    ``collect_list`` of at most k longs).
    """
    h = stable_hash60(F.col(col).cast("string"))
    pairs = df.select(*dims, h.alias("_h")).distinct()
    w = Window.partitionBy(*dims).orderBy("_h")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*dims)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def kmv_merge(
    sketches: DataFrame,
    dims: list[str] | tuple[str, ...],
    k: int = 256,
) -> DataFrame:
    """Union KMV sketches down to coarser ``dims`` (e.g. drop the day
    column of daily sketches): distinct-union the arrays, keep the k
    smallest.  Lossless: the global k minima are always contained in
    the union of per-part k minima.  Shuffles one k-long array per
    input group."""
    return sketches.groupBy(*dims).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv"),
        F.count(F.lit(1)).alias("n_parts"),
    )


def kmv_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a KMV array: exact ``size`` when
    fewer than k hashes were ever seen, else the unbiased
    ``(k-1)/theta_k`` estimator.  Pure double arithmetic over exact
    integers — deterministic across engines."""
    hk = F.element_at(kmv, k)
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        F.lit(float(k - 1) * HASH_SPACE) / hk
    )


def duck_kmv_estimate(k: int, hk_expr: str, nd_expr: str) -> str:
    """DuckDB SQL mirroring :func:`kmv_estimate`: ``hk_expr`` is the
    k-th smallest distinct hash (NULL when fewer than k), ``nd_expr``
    the distinct-hash count."""
    const = float(k - 1) * HASH_SPACE
    return (
        f"CASE WHEN {nd_expr} < {k} THEN CAST({nd_expr} AS DOUBLE) "
        f"ELSE {const!r} / {hk_expr} END"
    )


def hll_rollup(
    df: DataFrame,
    dims: list[str] | tuple[str, ...],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-``dims`` DataSketches HLL sketch bytes of ``col`` (the
    persistable rollup artifact; ~2^lgk bytes per group)."""
    return df.groupBy(*dims).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lgk)).alias("hll")
    )


def hll_merge_estimate(
    sketches: DataFrame,
    dims: list[str] | tuple[str, ...],
    lgk: int = 12,
) -> DataFrame:
    """Union HLL sketch bytes down to coarser ``dims`` and estimate."""
    merged = sketches.groupBy(*dims).agg(
        F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return merged.withColumn("n_est", F.hll_sketch_estimate("hll"))

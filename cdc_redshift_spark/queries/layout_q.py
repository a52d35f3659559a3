"""Gated evidence that range-clustered file layout actually prunes.

The reference pins this concern Redshift-side with its ``sortkey
(ts_date)`` DDL (glue_docdb_redshift_cdc.py:180); Spark-side the same
contract is ``operators/layout.cluster`` + parquet min/max statistics.
This query runs the END-TO-END path — write a range-clustered snapshot,
read it back through a narrow key predicate, aggregate — and raises
unless the layout lets a statistics reader skip >= 75% of the files, so
the green oracle row certifies both the values and the skipping.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.layout import (
    bloom_file_index,
    bloom_lookup_files,
    cluster,
    file_ranges,
    pruned_fraction,
    zonemap_file_index,
    zonemap_prune_files,
)
from cdc_redshift_spark.sources.tables import load_table

LAYOUT_FILES = 16
# the probed slice: 1/50th of the keyspace starting at the midpoint —
# narrow enough that a clustered layout skips ~94% of 16 files, wide
# enough to aggregate a few thousand rows
SLICE_DEN = 50


def q_layout_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders range-clustered on ``o_orderkey`` (16 files), scan
    the ``[mid, mid + span/50]`` key slice, aggregate per priority.
    Raises if the written layout would NOT let a min/max statistics
    reader skip at least 75% of the files — a hash-scattered layout
    fails loudly here instead of silently scanning everything."""
    orders = load_table(spark, sf_dir, "orders")
    hi_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    lo = hi_key // 2
    hi = lo + hi_key // SLICE_DEN

    root = tempfile.mkdtemp(prefix="layout_scan_")
    try:
        snap = f"{root}/orders_clustered"
        cluster(orders, ["o_orderkey"], num_files=LAYOUT_FILES).write.parquet(
            snap
        )
        ranges = file_ranges(snap, "o_orderkey")
        skipped = pruned_fraction(ranges, lo, hi)
        if skipped < 0.75:
            raise RuntimeError(
                f"range-clustered layout skips only {skipped:.0%} of "
                f"{len(ranges)} files for a 1/{SLICE_DEN} key slice — "
                "clustering is not delivering data-skipping"
            )
        out = (
            spark.read.parquet(snap)
            .where(F.col("o_orderkey").between(lo, hi))
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                # integer cents: float-sum order differences between
                # engines can't perturb the value hash
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("cents_total"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
            )
            .localCheckpoint(eager=True)  # snap dir is removed below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


ORACLE_LAYOUT_SCAN = f"""
WITH bounds AS (
  SELECT max(o_orderkey) // 2 AS lo,
         max(o_orderkey) // 2 + max(o_orderkey) // {SLICE_DEN} AS hi
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents_total,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM orders, bounds
WHERE o_orderkey BETWEEN bounds.lo AND bounds.hi
GROUP BY o_orderpriority
"""


def q_layout_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout evidence (operators/layout.py `zorder_cluster` —
    the multi-column answer lexicographic clustering cannot give):
    orders written Morton-clustered on (o_custkey, epoch-day), then a
    2-D box predicate — the midpoint eighth of BOTH key ranges —
    scanned and aggregated.  Raises unless parquet min/max statistics
    would let a skipping reader prune >= 25% of the files on EACH
    dimension independently (measured on this fixture: lexicographic
    gives 81%/0%, Z-order 38%/50% — locality on every clustered
    column is the whole point; cf. Delta ZORDER BY / Redshift
    interleaved sortkeys)."""
    from cdc_redshift_spark.operators.layout import zorder_cluster

    # 64 files, not 16: with only ~4x4 z-blocks the skip fraction sits
    # exactly on the assert boundary and repartitionByRange's sampled
    # boundaries wobble it run to run; 8x8 blocks give a stable
    # ~0.69/0.75 margin (measured across repeated runs)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_day", F.unix_date(F.to_date("o_orderdate"))
    )
    st = orders.agg(
        F.min("o_custkey").alias("cklo"),
        F.max("o_custkey").alias("ckhi"),
        F.min("o_day").alias("dlo"),
        F.max("o_day").alias("dhi"),
    ).collect()[0]
    ck_a = st.cklo + (st.ckhi - st.cklo) // 2
    ck_b = ck_a + (st.ckhi - st.cklo) // 8
    d_a = st.dlo + (st.dhi - st.dlo) // 2
    d_b = d_a + (st.dhi - st.dlo) // 8

    root = tempfile.mkdtemp(prefix="layout_zorder_")
    try:
        snap = f"{root}/orders_z"
        zorder_cluster(
            orders, ["o_custkey", "o_day"], num_files=4 * LAYOUT_FILES
        ).write.parquet(snap)
        for col, lo, hi in (
            ("o_custkey", ck_a, ck_b),
            ("o_day", d_a, d_b),
        ):
            skipped = pruned_fraction(file_ranges(snap, col), lo, hi)
            if skipped < 0.25:
                raise RuntimeError(
                    f"z-order layout skips only {skipped:.0%} of files "
                    f"on {col} — multi-dim locality is not delivering"
                )
        out = (
            spark.read.parquet(snap)
            .where(
                F.col("o_custkey").between(ck_a, ck_b)
                & F.col("o_day").between(d_a, d_b)
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("cents_total"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


ORACLE_ZORDER_SCAN = """
WITH d AS (
  SELECT o_orderpriority, o_totalprice, o_custkey,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS o_day
  FROM orders
), b AS (
  SELECT min(o_custkey) + (max(o_custkey) - min(o_custkey)) // 2 AS ck_a,
         min(o_custkey) + (max(o_custkey) - min(o_custkey)) // 2
           + (max(o_custkey) - min(o_custkey)) // 8 AS ck_b,
         min(o_day) + (max(o_day) - min(o_day)) // 2 AS d_a,
         min(o_day) + (max(o_day) - min(o_day)) // 2
           + (max(o_day) - min(o_day)) // 8 AS d_b
  FROM d
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents_total
FROM d, b
WHERE o_custkey BETWEEN b.ck_a AND b.ck_b
  AND o_day BETWEEN b.d_a AND b.d_b
GROUP BY o_orderpriority
"""


#: point-lookup keys for the Bloom-index query: spread across the
#: keyspace, plus one absent key (must match zero rows AND zero files
#: beyond false positives)
BLOOM_KEYS = [7, 1501, 4903, 9001, 13751]


def q_layout_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom index on a HASH-SCATTERED layout
    (operators/layout.bloom_file_index): the worst case for min/max
    stats — every file covers the whole key range, so range/z-order
    pruning is useless — yet point lookups must not scan the table.
    Writes orders hash-partitioned (16 files), builds the per-file
    Bloom index (one scan, bit_or aggregate, no UDF), resolves each
    probe key to its candidate file list, and reads ONLY those files.
    Raises unless the index lets every probe skip at least half the
    files (defaults give ~0.1% false positives, so typically 1 of 16
    is read).  The oracle is the plain filter over the full table, so
    a green row certifies the no-false-negative contract end-to-end.
    """
    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="layout_bloom_")
    try:
        snap = f"{root}/orders_scattered"
        orders.repartition(LAYOUT_FILES, "o_orderdate").write.parquet(snap)
        idx = bloom_file_index(spark, snap, "o_orderkey").cache()
        n_files = idx.count()
        parts = []
        for k in BLOOM_KEYS:
            files = bloom_lookup_files(idx, k)
            if len(files) > n_files // 2:
                raise RuntimeError(
                    f"bloom index skipped too little for key {k}: "
                    f"{len(files)}/{n_files} files matched"
                )
            if files:
                parts.append(
                    spark.read.parquet(*files).where(
                        F.col("o_orderkey") == k
                    )
                )
        idx.unpersist()
        if not parts:
            return spark.createDataFrame(
                [],
                "o_orderkey long, o_orderstatus string, cents long",
            )
        out = parts[0]
        for pdf in parts[1:]:
            out = out.unionByName(pdf)
        return (
            out.select(
                "o_orderkey",
                "o_orderstatus",
                F.round(F.col("o_totalprice") * 100).cast("long").alias(
                    "cents"
                ),
            )
            .orderBy("o_orderkey")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_BLOOM_LOOKUP = """
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
WHERE o_orderkey IN (7, 1501, 4903, 9001, 13751)
ORDER BY o_orderkey
"""


#: the zone-map probe window: one quarter out of orders' ~6.6-year
#: span (1995-01..2001-08 in this testdata; o_orderdate is a
#: TIMESTAMP), so a date-clustered 16-file layout must prune most of
#: the files.  Half-open [lo, hi) so both engines bound identically.
ZM_LO, ZM_HI = "1996-01-01", "1996-04-01"


def q_layout_zonemap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted zone-map index on a date-clustered layout
    (operators/layout.zonemap_file_index): write orders range-clustered
    on ``o_orderdate``, build the per-file min/max index with ONE
    distributed scan (no driver footer walk), resolve a quarter-long
    date-range predicate to an explicit candidate file list, and read
    ONLY those files.  Raises unless the index skips at least half the
    files.  The oracle is the plain date filter over the full table, so
    a green row certifies the no-false-negative pruning contract
    end-to-end — the range complement of ``layout_bloom_lookup``."""
    import datetime

    orders = load_table(spark, sf_dir, "orders")
    lo = datetime.datetime.fromisoformat(ZM_LO)
    hi = datetime.datetime.fromisoformat(ZM_HI)
    root = tempfile.mkdtemp(prefix="layout_zonemap_")
    try:
        snap = f"{root}/orders_dateclustered"
        cluster(
            orders, ["o_orderdate"], num_files=LAYOUT_FILES
        ).write.parquet(snap)
        idx = zonemap_file_index(
            spark, snap, ["o_orderdate", "o_orderkey"]
        ).cache()
        n_files = idx.count()
        files = zonemap_prune_files(idx, {"o_orderdate": (lo, hi)})
        idx.unpersist()
        if not files or len(files) > n_files // 2:
            raise RuntimeError(
                f"zone-map index pruning off-contract: {len(files)}/"
                f"{n_files} files intersect a one-quarter date window "
                "on a date-clustered layout"
            )
        out = (
            spark.read.parquet(*files)
            .where(
                (F.col("o_orderdate") >= F.lit(lo))
                & (F.col("o_orderdate") < F.lit(hi))
            )
            .groupBy(
                F.date_format("o_orderdate", "yyyy-MM").alias("month")
            )
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("cents_total"),
            )
            .orderBy("month")
            .localCheckpoint(eager=True)  # snap dir is removed below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


ORACLE_ZONEMAP_SCAN = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents_total
FROM orders
WHERE o_orderdate >= TIMESTAMP '{ZM_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{ZM_HI} 00:00:00'
GROUP BY 1
ORDER BY 1
"""


EDH_K = 8


def q_layout_range_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram over l_extendedprice
    (operators/layout.equi_depth_histogram): the balanced
    repartitionByRange bounds a 100 TB layout job should use instead
    of RangePartitioner's ~100-row sampling (which lands hot files
    under duplication/skew).  Two passes: one exact interpolated
    percentile aggregation (no sort, no window), one k-group count.
    The oracle recomputes the cut points with DuckDB quantile_cont —
    a green row certifies Spark percentile ≡ quantile_cont
    interpolation AND the 6-dp half-away bound rounding AND the
    bin-edge rule, end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    from cdc_redshift_spark.operators.layout import equi_depth_histogram

    return equi_depth_histogram(li, "l_extendedprice", EDH_K)


_EDH_PS = ", ".join(str(i / EDH_K) for i in range(1, EDH_K))

ORACLE_RANGE_BOUNDS = f"""
WITH b AS (
  SELECT list_transform(
           quantile_cont(l_extendedprice, [{_EDH_PS}]),
           x -> round(x, 6)
         ) AS bs
  FROM lineitem
), binned AS (
  SELECT CAST(len(list_filter((SELECT bs FROM b),
                              x -> x <= l_extendedprice)) AS INTEGER)
           AS bin
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
)
SELECT bin,
       CASE WHEN bin >= 1 THEN (SELECT bs FROM b)[bin] END AS lo,
       CASE WHEN bin <= {EDH_K - 2} THEN (SELECT bs FROM b)[bin + 1] END AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM binned
GROUP BY bin
ORDER BY bin
"""


QUERIES = {
    "layout_range_bounds": q_layout_range_bounds,
    "layout_bloom_lookup": q_layout_bloom_lookup,
    "layout_zonemap_scan": q_layout_zonemap_scan,
    "layout_pruned_scan": q_layout_pruned_scan,
    "layout_zorder_scan": q_layout_zorder_scan,
}
ORACLES = {
    "layout_range_bounds": ORACLE_RANGE_BOUNDS,
    "layout_bloom_lookup": ORACLE_BLOOM_LOOKUP,
    "layout_zonemap_scan": ORACLE_ZONEMAP_SCAN,
    "layout_pruned_scan": ORACLE_LAYOUT_SCAN,
    "layout_zorder_scan": ORACLE_ZORDER_SCAN,
}

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
    cluster,
    file_ranges,
    pruned_fraction,
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


QUERIES = {"layout_pruned_scan": q_layout_pruned_scan}
ORACLES = {"layout_pruned_scan": ORACLE_LAYOUT_SCAN}

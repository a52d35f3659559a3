"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``cdc_redshift_spark.queries.*``; this module just
aggregates them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pg-Debezium CDC replay (parse → normalize →
    LWW dedup → merge) on /root/testdata/sf0.001."""
    from cdc_redshift_spark.queries.cdc import q_cdc_pg_replay

    return q_cdc_pg_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdc_redshift_spark.queries import all_queries

    return all_queries()[0]


def oracle_sql() -> dict[str, str]:
    from cdc_redshift_spark.queries import all_queries

    return all_queries()[1]

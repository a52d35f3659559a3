"""Batch table loaders for the test star schema.

One quirk: ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's
vectorized parquet reader rejects; with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the
column arrives as epoch-nanos LongType, and we rebuild a proper
timestamp at microsecond precision here.  At 100 TB this is the right
call anyway: the cast is a scalar expression inside codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable; required even when the caller's session was
        # not built by our factory (e.g. the verify driver's session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all star-schema tables as temp views for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

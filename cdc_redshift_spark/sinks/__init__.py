"""Sink implementations: local Parquet (testable), Redshift/JDBC SQL codegen."""

from cdc_redshift_spark.sinks.base import Sink
from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

__all__ = ["Sink", "ParquetSink"]

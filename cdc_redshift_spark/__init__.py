"""cdc_redshift_spark — a PySpark-native CDC/analytics engine.

A brand-new engine with the capabilities of the reference
(Moonlight-CL/cdc-redshift: three AWS Glue PySpark streaming jobs that
land Kafka CDC events into Redshift), re-expressed Spark-first:

- Envelope normalizers (Debezium-Mongo / Debezium-Postgres / AWS DMS)
  into one canonical ChangeSet schema (``envelopes``, ``normalize``).
- Last-writer-wins dedup with a deterministic tiebreaker (``dedup``).
- Local, testable merge semantics (upsert + delete) over Parquet, plus
  Redshift/JDBC SQL code generation matching the reference's
  ``postactions`` templates (``sinks``).
- Structured Streaming shell: foreachBatch + trigger + checkpoint
  (``streaming``).
- Scale extensions: exact/near dedup, similarity search, text
  analysis, multimodal columns (``operators``).
"""

from cdc_redshift_spark.session import get_spark

__all__ = ["get_spark"]

__version__ = "0.1.0"

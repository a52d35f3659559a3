"""Sink abstraction: where a materialized CDC table state lives.

The reference's only sink is Redshift via the spark-redshift connector
(staged CSV COPY + postactions SQL — SURVEY §2.2 K1/K2).  We abstract
it so merge semantics are testable locally: ``ParquetSink`` executes
the merge natively in Spark; ``RedshiftSqlGen``/``JdbcSink`` push the
same semantics down as generated SQL.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class Sink(ABC):
    """A catalog of CDC target tables keyed by (db, table)."""

    @abstractmethod
    def table_exists(self, db: str, table: str) -> bool:
        """Reference: pg_tables existence probe (glue_pg_redshift_cdc.py:104-114)."""

    @abstractmethod
    def apply_changeset(self, db: str, table: str, changes: DataFrame) -> None:
        """Apply a deduped ChangeSet slice (upserts + deletes) for one table."""

    @abstractmethod
    def read_table(self, spark: SparkSession, db: str, table: str) -> DataFrame | None:
        """Current materialized state, or None if absent."""

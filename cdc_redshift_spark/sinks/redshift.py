"""Redshift sink: staged-COPY write + postactions SQL codegen.

Reproduces the reference's production path (SURVEY §2.2 K1/K2): the
spark-redshift connector writes CSV to an S3 tempdir, Redshift COPYs it
into a stage table, then runs a transactional ``postactions`` SQL batch
that merges stage into target.  We generate the same three SQL shapes:

- docdb/pg delete+insert transaction (glue_docdb_redshift_cdc.py:180-189,
  glue_pg_redshift_cdc.py:179-188): probe ``pg_tables`` first and
  prepend a plain CTAS inside the transaction only when the target is
  absent (``CREATE TABLE IF NOT EXISTS ... AS`` is not valid Redshift
  DDL), with the op column excluded from both the CTAS column list and
  the insert — glue_pg_redshift_cdc.py:178-191.
- DMS MERGE + DELETE USING (glue_dms_redshift_cdc.py:101-117).

plus the ``redshift_type`` column-metadata DDL convention
(glue_docdb_redshift_cdc.py:142-147, glue_pg_redshift_cdc.py:139-146)
that the connector uses to emit typed columns (SUPER for payloads):
:func:`ddl_columns` / :func:`jdbc_column_types` turn tagged schemas
into DDL fragments, and ``JdbcSink`` feeds them to Spark's JDBC
``createTableColumnTypes`` option.

``RedshiftSink`` / ``JdbcSink`` invoke the actual ``df.write`` with
the generated options; the write call and the catalog probe are
injectable so the full path is unit-testable without a warehouse (no
Redshift is reachable in tests).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

from cdc_redshift_spark.sinks.base import Sink

_log = logging.getLogger(__name__)

#: Connector class name, public spark-redshift community edition.
REDSHIFT_FORMAT = "io.github.spark_redshift_community.spark.redshift"


def super_col(col: Column, name: str) -> Column:
    """Tag a payload column to land as Redshift SUPER.

    Same metadata convention as the reference
    (glue_docdb_redshift_cdc.py:144: ``.alias('doc', metadata={'redshift_type': 'SUPER'})``).
    """
    return col.alias(name, metadata={"redshift_type": "SUPER"})


def typed_col(col: Column, name: str, redshift_type: str) -> Column:
    """Tag any column with an explicit Redshift DDL type (e.g. VARCHAR(120))."""
    return col.alias(name, metadata={"redshift_type": redshift_type})


#: Default Spark → Redshift type mapping for untagged columns (the same
#: mapping the connector documents for its DDL emission).
_SPARK_TO_REDSHIFT = {
    T.LongType(): "BIGINT",
    T.IntegerType(): "INTEGER",
    T.ShortType(): "SMALLINT",
    T.DoubleType(): "DOUBLE PRECISION",
    T.FloatType(): "REAL",
    T.BooleanType(): "BOOLEAN",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
    T.StringType(): "VARCHAR(MAX)",
}


def ddl_columns(schema: T.StructType) -> list[tuple[str, str]]:
    """(name, redshift_type) per field, honoring ``redshift_type``
    metadata set by :func:`super_col` / :func:`typed_col` (P7) and
    falling back to the standard Spark→Redshift mapping."""
    out = []
    for f in schema.fields:
        rt = (f.metadata or {}).get("redshift_type")
        if rt is None:
            rt = _SPARK_TO_REDSHIFT.get(f.dataType, "VARCHAR(MAX)")
        out.append((f.name, rt))
    return out


def create_table_ddl(
    target: str, schema: T.StructType, sort_key: str | None = "ts_date"
) -> str:
    """Explicit typed CREATE TABLE from a tagged schema — what the
    connector derives from the DataFrame when creating the stage."""
    cols = ", ".join(f"{n} {t}" for n, t in ddl_columns(schema))
    sk = f" sortkey ({sort_key})" if sort_key else ""
    return f"create table {target} ({cols}){sk}"


def jdbc_column_types(schema: T.StructType) -> str:
    """``createTableColumnTypes`` value for Spark's JDBC writer —
    the idiomatic Spark consumer of the ``redshift_type`` metadata."""
    return ", ".join(f"{n} {t}" for n, t in ddl_columns(schema))


@dataclass
class RedshiftConfig:
    """Connection/config keys, names matching the reference readme.md:11-23.

    ``cluster``/``port``/``database`` are the DB-API connection params
    the reference hands to ``redshift_connector.connect`` for the
    catalog probe + postactions runner (glue_pg_redshift_cdc.py:
    157-166) — kept alongside the JDBC ``url`` so a probe/run_sql
    binding can be built from the same config document."""

    url: str
    user: str
    password: str
    tempdir: str
    aws_iam_role: str
    schema: str = "public"
    tempformat: str = "CSV"
    cluster: str | None = None
    port: int | None = None
    database: str | None = None
    extra: dict = field(default_factory=dict)


def stage_name(target: str) -> str:
    """stage_<target> sibling naming (glue_pg_redshift_cdc.py:169)."""
    short = target.split(".")[-1]
    prefix = target[: -len(short)]
    return f"{prefix}stage_{short}"


def create_as_select_sql(
    target: str, stage: str, columns: Sequence[str], sort_key: str = "ts_date"
) -> str:
    """Plain CTAS from the stage's shape, op column already excluded —
    glue_pg_redshift_cdc.py:182-183 (``where 0=1``: shape only)."""
    return (
        f"create table {target} sortkey ({sort_key}) "
        f"as select {', '.join(columns)} from {stage} where 0=1;"
    )


def delete_insert_postactions(
    target: str,
    stage: str,
    join_key: str,
    columns: Sequence[str],
    table_exists: bool,
    delete_sentinel: str = "delete",
    op_col: str = "op_type",
    sort_key: str = "ts_date",
) -> str:
    """docdb/pg-style transactional delete+insert upsert (J3).

    Shape per glue_pg_redshift_cdc.py:178-191: delete matched keys,
    insert non-deletes listing the target columns explicitly (the op
    column never lands in the target), drop the stage — and, when the
    ``pg_tables`` probe says the target is absent, a plain CTAS is
    prepended INSIDE the transaction (the reference's
    ``appendDataSql.replace("begin;", "begin; " + createTableSql)``).
    ``columns`` is the stage column list; the op column is stripped
    here so callers can pass ``df.columns`` directly.
    """
    cols = [c for c in columns if c != op_col]
    collist = ", ".join(cols)
    sql = (
        "begin; "
        f"delete from {target} using {stage} "
        f"where {target}.{join_key} = {stage}.{join_key}; "
        # null-safe: a NULL op row is data, not a tombstone — the same
        # r15 contract as the native merge path (plans/merge.py); a
        # bare != would silently drop it between DELETE and INSERT
        f"insert into {target} ({collist}) select {collist} from {stage} "
        f"where {op_col} != '{delete_sentinel}' or {op_col} is null; "
        f"drop table {stage}; "
        "end;"
    )
    if not table_exists:
        sql = sql.replace(
            "begin; ", "begin; " + create_as_select_sql(target, stage, cols, sort_key) + " ", 1
        )
    return sql


def merge_postactions(
    target: str,
    stage: str,
    join_key: str,
    create_if_absent: bool = True,
) -> str:
    """DMS-style MERGE upsert (J2, glue_dms_redshift_cdc.py:101-110).

    ``CREATE TABLE IF NOT EXISTS (PRIMARY KEY(..), LIKE stage)`` IS
    valid Redshift (unlike CTAS-if-not-exists), so no probe is needed
    on this path — same as the reference.
    """
    stmts = []
    if create_if_absent:
        stmts.append(
            f"create table if not exists {target} "
            f"(primary key({join_key}), like {stage})"
        )
    stmts += [
        f"merge into {target} using {stage} s "
        f"on ({target}.{join_key} = s.{join_key}) remove duplicates",
        f"truncate table {stage}",
    ]
    return "begin; " + "; ".join(stmts) + "; commit;"


def delete_using_postactions(target: str, stage: str, join_key: str) -> str:
    """DMS-style delete application (J1, glue_dms_redshift_cdc.py:112-117)."""
    return (
        "begin; "
        f"delete from {target} using {stage} "
        f"where {target}.{join_key} = {stage}.{join_key}; "
        f"truncate table {stage}; "
        "commit;"
    )


def table_exists_sql(schema: str, table: str | None = None) -> str:
    """Catalog probe (S4, glue_pg_redshift_cdc.py:104-105: filters on
    BOTH tablename and schemaname)."""
    sql = "select distinct tablename from pg_tables where schemaname = '{s}'".format(
        s=schema
    )
    if table is not None:
        sql += f" and tablename = '{table}'"
    return sql


def write_options(cfg: RedshiftConfig, stage_table: str, postactions: str) -> dict[str, str]:
    """Option dict for ``df.write.format(REDSHIFT_FORMAT)`` —
    key set per glue_pg_redshift_cdc.py:192-203."""
    return {
        "url": cfg.url,
        "dbtable": stage_table,
        "user": cfg.user,
        "password": cfg.password,
        "tempdir": cfg.tempdir,
        "tempformat": cfg.tempformat,
        "aws_iam_role": cfg.aws_iam_role,
        "postactions": postactions,
        **cfg.extra,
    }


def _default_write(df: DataFrame, fmt: str, options: dict[str, str]) -> None:
    df.write.format(fmt).options(**options).mode("append").save()


class RedshiftSink(Sink):
    """Staged-COPY Redshift sink (K1): per-table stage write with the
    transactional delete+insert postactions batch, exactly the
    reference's per-(db, table) write task (glue_pg_redshift_cdc.py:
    160-207).

    ``probe`` answers "does the target exist?" (a live deployment binds
    it to a DB-API connection running :func:`table_exists_sql`, like
    the reference's ``checkRedshiftTableExists``); ``writer`` performs
    the connector write (injectable for tests; the default invokes
    ``df.write.format(...)``).  Known target tables are cached after
    the first sighting — once created, a table stays created
    (A3/S4 distinct catalog lookup).
    """

    def __init__(
        self,
        cfg: RedshiftConfig,
        join_key: str = "pk_id",
        op_col: str = "op_type",
        delete_sentinel: str = "delete",
        sort_key: str = "ts_date",
        probe: Callable[[str, str], bool] | None = None,
        writer: Callable[[DataFrame, str, dict[str, str]], None] | None = None,
    ):
        self.cfg = cfg
        self.join_key = join_key
        self.op_col = op_col
        self.delete_sentinel = delete_sentinel
        self.sort_key = sort_key
        self.probe = probe
        self.writer = writer or _default_write
        self._known: set[tuple[str, str]] = set()

    def _target(self, db: str, table: str) -> str:
        return f"{self.cfg.schema}.{db}_{table}"

    def table_exists(self, db: str, table: str) -> bool:
        """Cache, then probe.  The ``_known`` cache is process-local:
        after a driver restart a previously-created target looks absent
        unless a ``probe`` is configured, and the CTAS then prepended by
        ``delete_insert_postactions`` FAILS against the existing table —
        so a probe is mandatory for any deployment that restarts (the
        reference always probes ``pg_tables``).  ``probe=None`` is a
        single-process convenience (tests, one-shot backfills) and is
        warned about on every cache miss."""
        if (db, table) in self._known:
            return True
        if self.probe is None:
            _log.warning(
                "RedshiftSink: no catalog probe configured — assuming %s.%s_%s "
                "does not exist. If it does (e.g. created before a driver "
                "restart), the generated CTAS will fail; pass probe= backed "
                "by pg_tables for restart-safe operation.",
                self.cfg.schema,
                db,
                table,
            )
            return False
        return self.probe(self.cfg.schema, f"{db}_{table}")

    def apply_changeset(self, db: str, table: str, changes: DataFrame) -> None:
        target = self._target(db, table)
        stage = stage_name(target)
        post = delete_insert_postactions(
            target,
            stage,
            self.join_key,
            changes.columns,
            table_exists=self.table_exists(db, table),
            delete_sentinel=self.delete_sentinel,
            op_col=self.op_col,
            sort_key=self.sort_key,
        )
        opts = write_options(self.cfg, stage, post)
        # per-table temp prefix, like the reference's
        # f"{tmpdir}{targetTableWithoutSchema}" (glue_pg_redshift_cdc.py:173)
        opts["tempdir"] = f"{self.cfg.tempdir}{db}_{table}"
        self.writer(changes, REDSHIFT_FORMAT, opts)
        self._known.add((db, table))

    def read_table(self, spark: SparkSession, db: str, table: str) -> DataFrame | None:
        """Read-back via the connector's query pushdown."""
        if not self.table_exists(db, table):
            return None
        return (
            spark.read.format(REDSHIFT_FORMAT)
            .option("url", self.cfg.url)
            .option("user", self.cfg.user)
            .option("password", self.cfg.password)
            .option("tempdir", self.cfg.tempdir)
            .option("dbtable", self._target(db, table))
            .load()
        )


class JdbcSink(Sink):
    """Generic JDBC staged sink: stage table written with Spark's JDBC
    writer (``createTableColumnTypes`` derived from the
    ``redshift_type`` column metadata — the P7 consumer), then the same
    postactions batch executed through a caller-supplied statement
    runner (a DB-API cursor/connection in production; the reference
    itself opens ``redshift_connector`` connections for exactly this,
    glue_pg_redshift_cdc.py:157-166)."""

    def __init__(
        self,
        url: str,
        properties: dict[str, str] | None = None,
        schema: str = "public",
        join_key: str = "pk_id",
        op_col: str = "op_type",
        delete_sentinel: str = "delete",
        sort_key: str = "ts_date",
        run_sql: Callable[[str], list | None] | None = None,
        writer: Callable[[DataFrame, str, dict[str, str]], None] | None = None,
    ):
        self.url = url
        self.properties = properties or {}
        self.schema = schema
        self.join_key = join_key
        self.op_col = op_col
        self.delete_sentinel = delete_sentinel
        self.sort_key = sort_key
        self.run_sql = run_sql
        self.writer = writer or _default_write
        self._known: set[tuple[str, str]] = set()

    def _target(self, db: str, table: str) -> str:
        return f"{self.schema}.{db}_{table}"

    def table_exists(self, db: str, table: str) -> bool:
        if (db, table) in self._known:
            return True
        if self.run_sql is None:
            return False
        rows = self.run_sql(table_exists_sql(self.schema, f"{db}_{table}"))
        return bool(rows)

    def apply_changeset(self, db: str, table: str, changes: DataFrame) -> None:
        target = self._target(db, table)
        stage = stage_name(target)
        opts = {
            "url": self.url,
            "dbtable": stage,
            # typed stage DDL from redshift_type metadata (P7)
            "createTableColumnTypes": jdbc_column_types(changes.schema),
            **self.properties,
        }
        self.writer(changes, "jdbc", opts)
        if self.run_sql is not None:
            self.run_sql(
                delete_insert_postactions(
                    target,
                    stage,
                    self.join_key,
                    changes.columns,
                    table_exists=self.table_exists(db, table),
                    delete_sentinel=self.delete_sentinel,
                    op_col=self.op_col,
                    sort_key=self.sort_key,
                )
            )
        self._known.add((db, table))

    def read_table(self, spark: SparkSession, db: str, table: str) -> DataFrame | None:
        if not self.table_exists(db, table):
            return None
        return (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self._target(db, table))
            .options(**self.properties)
            .load()
        )

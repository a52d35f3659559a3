"""Redshift sink: staged-COPY write options + postactions SQL codegen.

Reproduces the reference's production path (SURVEY §2.2 K1/K2): the
spark-redshift connector writes CSV to an S3 tempdir, Redshift COPYs it
into a stage table, then runs a transactional ``postactions`` SQL batch
that merges stage into target.  We generate the same three SQL shapes:

- docdb/pg delete+insert transaction (glue_docdb_redshift_cdc.py:180-189,
  glue_pg_redshift_cdc.py:179-188)
- DMS MERGE + DELETE USING (glue_dms_redshift_cdc.py:101-117)

plus the ``redshift_type`` column-metadata DDL convention
(glue_docdb_redshift_cdc.py:142-147) the connector uses to emit typed
columns (SUPER for payloads).

No Redshift is reachable in tests, so codegen is unit-tested as
strings; ``write_options`` returns the exact connector option dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column

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


@dataclass
class RedshiftConfig:
    """Connection/config keys, names matching the reference readme.md:11-23."""

    url: str
    user: str
    password: str
    tempdir: str
    aws_iam_role: str
    schema: str = "public"
    tempformat: str = "CSV"
    extra: dict = field(default_factory=dict)


def stage_name(target: str) -> str:
    """stage_<target> sibling naming (glue_pg_redshift_cdc.py:169)."""
    short = target.split(".")[-1]
    prefix = target[: -len(short)]
    return f"{prefix}stage_{short}"


def delete_insert_postactions(
    target: str,
    stage: str,
    join_key: str,
    delete_sentinel: str = "delete",
    op_col: str = "op_type",
    sort_key: str = "ts_date",
    create_if_absent: bool = True,
) -> str:
    """docdb/pg-style transactional delete+insert upsert (J3).

    Shape per glue_docdb_redshift_cdc.py:180-189 /
    glue_pg_redshift_cdc.py:179-188: optional CTAS-if-absent with
    sortkey, then atomically delete matched keys, insert non-deletes,
    drop the stage table.
    """
    stmts = []
    if create_if_absent:
        stmts.append(
            f"create table if not exists {target} sortkey ({sort_key}) "
            f"as select * from {stage} where 1=3"
        )
    stmts += [
        "begin",
        f"delete from {target} using {stage} "
        f"where {target}.{join_key} = {stage}.{join_key}",
        f"insert into {target} select * from {stage} "
        f"where {op_col} != '{delete_sentinel}'",
        f"drop table if exists {stage}",
        "end",
    ]
    return "; ".join(stmts) + ";"


def merge_postactions(
    target: str,
    stage: str,
    join_key: str,
    create_if_absent: bool = True,
) -> str:
    """DMS-style MERGE upsert (J2, glue_dms_redshift_cdc.py:101-110)."""
    stmts = []
    if create_if_absent:
        stmts.append(f"create table if not exists {target} (like {stage})")
    stmts += [
        "begin",
        f"merge into {target} using {stage} on {target}.{join_key} = {stage}.{join_key} "
        "remove duplicates",
        f"truncate table {stage}",
        "end",
    ]
    return "; ".join(stmts) + ";"


def delete_using_postactions(target: str, stage: str, join_key: str) -> str:
    """DMS-style delete application (J1, glue_dms_redshift_cdc.py:112-117)."""
    return (
        "begin; "
        f"delete from {target} using {stage} "
        f"where {target}.{join_key} = {stage}.{join_key}; "
        f"truncate table {stage}; "
        "end;"
    )


def table_exists_sql(schema: str) -> str:
    """Catalog probe (S4, glue_pg_redshift_cdc.py:105)."""
    return (
        "select distinct tablename from pg_tables "
        f"where schemaname = '{schema}'"
    )


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

"""Job configuration loader (S2) — same document shape as the reference.

The reference fetches a JSON config document from S3 at startup
(glue_pg_redshift_cdc.py:38-46, shape at readme.md:11-44) with four
sections: ``redshift_conf``, ``msk_conf``, ``spark_batch_conf``,
``spark_conf``; the DMS script adds top-level ``record_id_key``,
``apply_delete``, ``cdc_timestamp_format`` (glue_dms_redshift_cdc.py:58-71).

Key names follow the reference document literally (readme.md:14-43):
``brokers``, ``groupId``, ``pollTimeoutMs``, ``executorMemory``,
``executorCores``, ``shufflePartitions``, ``defaultParallelism``,
``dynamicAllocationEnabled``, ``tmpdir``.  Dotted/underscore aliases
from earlier revisions of this engine are still accepted as fallbacks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from cdc_redshift_spark.sinks.redshift import RedshiftConfig
from cdc_redshift_spark.sources.streams import KafkaSourceConfig


def _get(m: dict[str, Any], *names: str, default: Any = None) -> Any:
    """First present key wins — reference spelling listed first."""
    for n in names:
        if n in m:
            return m[n]
    return default


@dataclass
class JobConfig:
    """Typed view over the reference's config document (readme.md:11-44)."""

    redshift_conf: dict[str, Any] = field(default_factory=dict)
    msk_conf: dict[str, Any] = field(default_factory=dict)
    spark_batch_conf: dict[str, Any] = field(default_factory=dict)
    spark_conf: dict[str, Any] = field(default_factory=dict)
    # DMS-script top-level keys (glue_dms_redshift_cdc.py:36-38,64-69).
    record_id_key: str = "id"
    apply_delete: bool = True
    cdc_timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss'Z'"

    # -- msk_conf (readme.md:24-31) ----------------------------------------
    def kafka_source(self) -> KafkaSourceConfig:
        m = self.msk_conf
        brokers = _get(m, "brokers", "kafka_bootstrap_servers")
        if brokers is None:
            raise KeyError("msk_conf requires 'brokers' (readme.md:25)")
        max_off = _get(m, "maxOffsetsPerTrigger")
        poll = _get(m, "pollTimeoutMs", "kafkaConsumer.pollTimeoutMs")
        return KafkaSourceConfig(
            bootstrap_servers=brokers,
            topic=m["topic"],
            starting_offsets=_get(m, "startingOffsets", default="latest"),
            max_offsets_per_trigger=int(max_off) if max_off is not None else None,
            poll_timeout_ms=int(poll) if poll is not None else None,
            commit_group_id=_get(m, "groupId", "kafka.consumer.commit.groupid"),
        )

    # -- redshift_conf (readme.md:14-23) -------------------------------------
    def redshift_config(self) -> RedshiftConfig:
        r = self.redshift_conf
        tmpdir = _get(r, "tmpdir", "tempdir")
        if tmpdir is None:
            raise KeyError("redshift_conf requires 'tmpdir' (readme.md:21)")
        known = {
            "url", "cluster", "port", "database", "schema", "user",
            "password", "tmpdir", "tempdir", "aws_iam_role",
        }
        port = r.get("port")
        return RedshiftConfig(
            url=r["url"],
            user=r["user"],
            password=r["password"],
            tempdir=tmpdir,
            aws_iam_role=r.get("aws_iam_role", ""),
            schema=r.get("schema", "public"),
            # DB-API probe/postactions connection params
            # (glue_pg_redshift_cdc.py:157-166) — carried, not dropped
            cluster=r.get("cluster"),
            port=int(port) if port is not None else None,
            database=r.get("database"),
            extra={k: v for k, v in r.items() if k not in known},
        )

    # -- spark_batch_conf (readme.md:32-35) ---------------------------------
    @property
    def window_size(self) -> str:
        return self.spark_batch_conf.get("windowSize", "30 seconds")

    @property
    def checkpoint_location(self) -> str | None:
        return self.spark_batch_conf.get("checkpointLocation")

    # -- spark_conf (readme.md:36-43) ----------------------------------------
    def spark_builder_conf(self) -> dict[str, str]:
        """SparkConf entries, reproducing createSparkConf
        (glue_pg_redshift_cdc.py:91-102) but with AQE on instead of the
        reference's hardcoded 1-partition shuffle (SURVEY §4)."""
        s = self.spark_conf

        def norm_bool(v: Any) -> str:
            # The reference document carries "fasle" [sic] for
            # speculation (readme.md:42); anything not truthy-spelled
            # is treated as false, matching Spark's lenient parse of
            # the reference's raw pass-through.
            return "true" if str(v).strip().lower() == "true" else "false"

        out = {
            "spark.dynamicAllocation.enabled": norm_bool(
                _get(s, "dynamicAllocationEnabled", "dynamicAllocation.enabled",
                     default=False)
            ),
            "spark.speculation": norm_bool(_get(s, "speculation", default=False)),
            "spark.sql.adaptive.enabled": "true",
        }
        mapping = [
            ("spark.executor.memory", ("executorMemory", "executor.memory")),
            ("spark.executor.cores", ("executorCores", "executor.cores")),
            ("spark.sql.shuffle.partitions",
             ("shufflePartitions", "sql.shuffle.partitions")),
            ("spark.default.parallelism",
             ("defaultParallelism", "default.parallelism")),
        ]
        for conf_key, names in mapping:
            v = _get(s, *names)
            if v is not None:
                out[conf_key] = str(v)
        return out


def load_config(source: str | dict[str, Any]) -> JobConfig:
    """Load a job config from a dict, local JSON path, or s3:// URL."""
    if isinstance(source, dict):
        doc = source
    elif source.startswith("s3://"):
        try:
            import boto3  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - no boto3 in test env
            raise RuntimeError("boto3 required for s3:// config sources") from e
        bucket, _, key = source[5:].partition("/")
        body = boto3.client("s3").get_object(Bucket=bucket, Key=key)["Body"].read()
        doc = json.loads(body)
    else:
        with open(source) as f:
            doc = json.load(f)
    return JobConfig(
        redshift_conf=doc.get("redshift_conf", {}),
        msk_conf=doc.get("msk_conf", {}),
        spark_batch_conf=doc.get("spark_batch_conf", {}),
        spark_conf=doc.get("spark_conf", {}),
        record_id_key=doc.get("record_id_key", "id"),
        apply_delete=bool(doc.get("apply_delete", True)),
        cdc_timestamp_format=doc.get(
            "cdc_timestamp_format", "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ),
    )

"""CDC correctness queries: deterministic change-log replay with SQL oracles.

Each query synthesizes a CDC change log from the static TPC-H-ish
tables (deterministic function of the rows — no randomness), pushes it
through the real envelope-parse → normalize → LWW-dedup → merge
pipeline, and returns the final materialized state.  The DuckDB oracle
computes the same final state directly with SQL, so the driver's
hash-compare checks the full pipeline semantics:

- envelope JSON parse (P1-P3), key extraction (P4), op normalization (F5)
- last-writer-wins dedup with tiebreak (W1)
- merge upsert + delete (J1-J3) incl. delete-after-update ordering

Change-log construction rules (orders → pg_cdc events):
- every order        → insert  at ts,            offset = 10k
- o_orderkey % 3 = 0 → update  at ts + 1 day,    offset = 10k+1  (status → 'U')
- o_orderkey % 7 = 0 → delete  at ts + 2 days,   offset = 10k+2
So keys divisible by 21 see update-then-delete; the delete wins (later ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.dedup import latest_per_key
from cdc_redshift_spark.normalize import mongo_changeset, pg_changeset
from cdc_redshift_spark.plans.merge import apply_changeset
from cdc_redshift_spark.sources.tables import load_table

_DAY_MS = 86_400_000


def synth_pg_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders.parquet → raw Kafka-shaped frame of Debezium-PG envelopes.

    Returns (value string, offset long) rows — exactly what a Kafka scan
    yields after the CAST(value AS STRING) prologue.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def payload(status_col):
        return F.to_json(
            F.struct(
                F.col("o_orderkey").alias("id"),
                status_col.alias("status"),
                F.col("o_totalprice").alias("total"),
            )
        )

    # parquet timestamps load as TIMESTAMP_NTZ; session TZ is UTC so the
    # cast is a pure reinterpretation
    ts0 = F.unix_millis(F.col("o_orderdate").cast("timestamp"))

    def envelope(before, after, op, ts_ms, off):
        src = F.struct(
            F.lit("2.4").alias("version"),
            F.lit("postgresql").alias("connector"),
            F.lit("pgserver").alias("name"),
            ts_ms.cast("long").alias("ts_ms"),
            F.lit("false").alias("snapshot"),
            F.lit("tpch").alias("db"),
            F.lit(None).cast("string").alias("sequence"),
            F.lit("public").alias("schema"),
            F.lit("orders_cdc").alias("table"),
            F.lit(None).cast("long").alias("txId"),
            F.lit(None).cast("long").alias("lsn"),
            F.lit(None).cast("long").alias("xmin"),
        )
        env = F.struct(
            before.alias("before"),
            after.alias("after"),
            src.alias("source"),
            F.lit(op).alias("op"),
            ts_ms.cast("long").alias("ts_ms"),
            F.lit(None).cast("string").alias("transaction"),
        )
        return orders.select(
            F.to_json(env).alias("value"), off.cast("long").alias("offset")
        )

    null_s = F.lit(None).cast("string")
    k = F.col("o_orderkey")
    inserts = envelope(null_s, payload(F.col("o_orderstatus")), "c", ts0, k * 10)
    updates = orders.filter(k % 3 == 0).select(
        F.to_json(
            F.struct(
                payload(F.col("o_orderstatus")).alias("before"),
                payload(F.lit("U")).alias("after"),
                F.struct(
                    F.lit("2.4").alias("version"),
                    F.lit("postgresql").alias("connector"),
                    F.lit("pgserver").alias("name"),
                    (ts0 + _DAY_MS).cast("long").alias("ts_ms"),
                    F.lit("false").alias("snapshot"),
                    F.lit("tpch").alias("db"),
                    null_s.alias("sequence"),
                    F.lit("public").alias("schema"),
                    F.lit("orders_cdc").alias("table"),
                    F.lit(None).cast("long").alias("txId"),
                    F.lit(None).cast("long").alias("lsn"),
                    F.lit(None).cast("long").alias("xmin"),
                ).alias("source"),
                F.lit("u").alias("op"),
                (ts0 + _DAY_MS).cast("long").alias("ts_ms"),
                null_s.alias("transaction"),
            )
        ).alias("value"),
        (k * 10 + 1).cast("long").alias("offset"),
    )
    deletes_src = orders.filter(k % 7 == 0)
    deletes = deletes_src.select(
        F.to_json(
            F.struct(
                F.to_json(
                    F.struct(
                        k.alias("id"),
                        # Debezium's delete before-image reflects the
                        # CURRENT row, i.e. the post-update status for
                        # keys the update wave touched — retraction
                        # consumers (normalize_pg_retractions) depend
                        # on image consistency
                        F.when(k % 3 == 0, F.lit("U"))
                        .otherwise(F.col("o_orderstatus"))
                        .alias("status"),
                        F.col("o_totalprice").alias("total"),
                    )
                ).alias("before"),
                null_s.alias("after"),
                F.struct(
                    F.lit("2.4").alias("version"),
                    F.lit("postgresql").alias("connector"),
                    F.lit("pgserver").alias("name"),
                    (ts0 + 2 * _DAY_MS).cast("long").alias("ts_ms"),
                    F.lit("false").alias("snapshot"),
                    F.lit("tpch").alias("db"),
                    null_s.alias("sequence"),
                    F.lit("public").alias("schema"),
                    F.lit("orders_cdc").alias("table"),
                    F.lit(None).cast("long").alias("txId"),
                    F.lit(None).cast("long").alias("lsn"),
                    F.lit(None).cast("long").alias("xmin"),
                ).alias("source"),
                F.lit("d").alias("op"),
                (ts0 + 2 * _DAY_MS).cast("long").alias("ts_ms"),
                null_s.alias("transaction"),
            )
        ).alias("value"),
        (k * 10 + 2).cast("long").alias("offset"),
    )
    return inserts.unionByName(updates).unionByName(deletes)


def q_cdc_pg_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full pg-Debezium replay → final table state."""
    raw = synth_pg_changelog(spark, sf_dir)
    changes = pg_changeset(raw, offset_col="offset")
    deduped = latest_per_key(changes, keys=("db", "table", "key"))
    state = apply_changeset(None, deduped, keys=("db", "table", "key"))
    return state.select(
        F.col("key").cast("bigint").alias("okey"),
        F.get_json_object("payload", "$.status").alias("status"),
        F.get_json_object("payload", "$.total").cast("double").alias("total"),
        F.col("op"),
    )


ORACLE_CDC_PG_REPLAY = """
SELECT o_orderkey AS okey,
       CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
       o_totalprice AS total,
       CASE WHEN o_orderkey % 3 = 0 THEN 'update' ELSE 'insert' END AS op
FROM orders
WHERE o_orderkey % 7 <> 0
"""


def q_cdc_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``VariantType`` payload path (SURVEY §1.1): the closer
    analogue of the reference's Redshift SUPER binding
    (glue_pg_redshift_cdc.py:141-145 casts payload to a SUPER-bound
    string column; Redshift then does typed path access) — here the
    normalizer parses the payload ONCE into an encoded variant
    (``pg_changeset(payload_variant=True)`` → ``payload_v``) and every
    typed extraction (``variant_get``: BIGINT id, STRING status,
    DOUBLE total) reads the pre-shredded encoding instead of
    re-parsing JSON per path per row, which is what
    ``get_json_object`` on the string column costs.  The replay +
    LWW + delete semantics are the certified pg_replay chain; the new
    surface under test is the variant extraction, certified by
    aggregating ONLY variant-derived values.  Money rides integer
    cents (PARITY.md)."""
    raw = synth_pg_changelog(spark, sf_dir)
    changes = pg_changeset(raw, offset_col="offset", payload_variant=True)
    deduped = latest_per_key(changes, keys=("db", "table", "key"))
    state = deduped.where(F.col("op") != "delete")
    typed = state.select(
        F.variant_get("payload_v", "$.id", "bigint").alias("okey"),
        F.variant_get("payload_v", "$.status", "string").alias("status"),
        F.variant_get("payload_v", "$.total", "double").alias("total"),
    )
    return (
        typed.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("total") * 100).cast("long")).alias(
                "total_cents"
            ),
            F.min("okey").alias("min_okey"),
            F.max("okey").alias("max_okey"),
        )
        .orderBy("status")
    )


ORACLE_CDC_VARIANT_PAYLOAD = """
WITH survivors AS (
  SELECT o_orderkey AS okey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'U'
              ELSE o_orderstatus END AS status,
         o_totalprice AS total
  FROM orders
  WHERE o_orderkey % 7 <> 0
)
SELECT status,
       count(*) AS n,
       CAST(sum(CAST(round(total * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       min(okey) AS min_okey,
       max(okey) AS max_okey
FROM survivors
GROUP BY status
ORDER BY status
"""


def q_cdc_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 in isolation: last event per user in the events table.

    Same window the reference runs per batch
    (glue_pg_redshift_cdc.py:134-136), keys=(user), order=(ts desc,
    event_id desc as offset tiebreak).
    """
    events = load_table(spark, sf_dir, "events")
    # order on raw epoch-nanos (ts_ns) so tie semantics match DuckDB's
    # nanosecond-precision ORDER BY ts exactly
    deduped = latest_per_key(
        events, keys=("user_id",), ts_col="ts_ns", tiebreak_col="event_id"
    )
    return deduped.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


ORACLE_CDC_LWW_DEDUP = """
SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_cdc_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization + routing check: events per (table, normalized op)."""
    raw = synth_pg_changelog(spark, sf_dir)
    changes = pg_changeset(raw, offset_col="offset")
    return (
        changes.groupBy("db", "table", "op")
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("key").alias("n_keys"))
        .orderBy("db", "table", "op")
    )


ORACLE_CDC_OP_COUNTS = """
WITH ev AS (
  SELECT o_orderkey AS key, 'insert' AS op FROM orders
  UNION ALL
  SELECT o_orderkey, 'update' FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 'delete' FROM orders WHERE o_orderkey % 7 = 0
)
SELECT 'tpch' AS db, 'orders_cdc' AS "table", op,
       count(*) AS n, count(DISTINCT key) AS n_keys
FROM ev GROUP BY op ORDER BY db, "table", op
"""


_BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _dms_envelope(src: DataFrame, data, op: str, ts_ms, off) -> DataFrame:
    """Wrap a JSON payload column in the AWS DMS envelope shape
    (data/control/metadata — glue_dms_redshift_cdc.py:80-100)."""
    meta = F.struct(
        F.date_format(
            F.timestamp_millis(ts_ms.cast("long")),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
        ).alias("timestamp"),
        F.lit("data").alias("record-type"),
        F.lit(op).alias("operation"),
        F.lit("schema-table").alias("partition-key-type"),
        F.lit("tpch").alias("schema-name"),
        F.lit("customer_cdc").alias("table-name"),
    )
    env = F.struct(
        data.alias("data"), F.lit(None).cast("string").alias("control"), meta.alias("metadata")
    )
    return src.select(F.to_json(env).alias("value"), off.cast("long").alias("offset"))


def synth_dms_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer.parquet → raw Kafka-shaped frame of AWS DMS envelopes.

    Change rules (customer → dms events):
    - every customer        → insert at base + key s,        offset 10k
    - c_custkey % 5 == 0    → update at base + key s + 1 d,  offset 10k+1 (segment → 'UPDATED')
    - c_custkey % 11 == 0   → delete at base + key s + 2 d,  offset 10k+2
    Payload carries gmt_created in the reference's default
    cdc_timestamp_format so the relational path exercises coercion
    (glue_dms_redshift_cdc.py:165-166).
    """
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    ts0 = F.lit(_BASE_MS) + k * 1000

    def payload(segment_col):
        return F.to_json(
            F.struct(
                k.alias("id"),
                F.col("c_name").alias("name"),
                segment_col.alias("segment"),
                F.col("c_acctbal").alias("balance"),
                F.lit("2024-01-01T00:00:00Z").alias("gmt_created"),
            )
        )

    inserts = _dms_envelope(customer, payload(F.col("c_mktsegment")), "insert", ts0, k * 10)
    updates = _dms_envelope(
        customer.filter(k % 5 == 0),
        payload(F.lit("UPDATED")),
        "update",
        ts0 + _DAY_MS,
        k * 10 + 1,
    )
    deletes = _dms_envelope(
        customer.filter(k % 11 == 0),
        payload(F.col("c_mktsegment")),
        "delete",
        ts0 + 2 * _DAY_MS,
        k * 10 + 2,
    )
    return inserts.unionByName(updates).unionByName(deletes)


def q_cdc_dms_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DMS relational replay: envelope → ChangeSet → LWW dedup →
    inferred-schema payload explosion → typed merged state (M3).

    The full glue_dms_redshift_cdc.py pipeline shape (:130-195) run
    natively: schema inferred once via SchemaCache, gmt_created coerced
    to timestamp, merge on the relational key.
    """
    from cdc_redshift_spark.infer import SchemaCache, explode_payload
    from cdc_redshift_spark.normalize import dms_changeset

    raw = synth_dms_changelog(spark, sf_dir)
    changes = latest_per_key(
        dms_changeset(raw, offset_col="offset"), keys=("db", "table", "key")
    )
    schema = SchemaCache().get("tpch", "customer_cdc", changes)
    rel = explode_payload(changes, schema)
    state = apply_changeset(None, rel, keys=("key",))
    return state.select(
        F.col("id").alias("id"),
        F.col("name").alias("name"),
        F.col("segment").alias("segment"),
        F.col("balance").alias("balance"),
        F.col("gmt_created").alias("gmt_created"),
    )


def q_cdc_dms_variant_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL DMS relational replay with ``payload_variant=True``
    actually CONSUMED (VERDICT r10 #7): the normalizer parses the
    payload once into an encoded variant, and the relational
    explosion reads every inferred-schema field as a typed
    ``variant_get`` path (:func:`infer.explode_payload_variant`)
    instead of re-parsing the JSON string with ``from_json`` — the
    knob the r10 round certified in isolation (2.6x on 4-path
    extraction, SCALE.md) wired through the real envelope → ChangeSet
    → LWW → explode → merge chain.  Same oracle as
    ``cdc_dms_relational``: the two explosions must be
    indistinguishable downstream.  In-query plan pin: the optimized
    plan must contain ``variant_get`` and must NOT contain any
    ``from_json`` (the string re-parse the variant path exists to
    delete)."""
    from cdc_redshift_spark.infer import SchemaCache, explode_payload_variant
    from cdc_redshift_spark.normalize import dms_changeset

    raw = synth_dms_changelog(spark, sf_dir)
    changes = latest_per_key(
        dms_changeset(raw, offset_col="offset", payload_variant=True),
        keys=("db", "table", "key"),
    )
    schema = SchemaCache().get("tpch", "customer_cdc", changes)
    rel = explode_payload_variant(changes, schema)
    state = apply_changeset(None, rel, keys=("key",))
    out = state.select("id", "name", "segment", "balance", "gmt_created")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    if "variant_get" not in plan:
        raise RuntimeError("variant path not in plan — knob not consumed")
    # Catalyst prints JsonToStructs schema-first, so a bare
    # "from_json(payload" can never match (review r11).  The ONE
    # legitimate from_json here is the normalizer's ENVELOPE parse
    # (schema fields data/control/metadata); any from_json whose
    # leading schema field is something else is a payload re-parse —
    # the exact node the variant path exists to delete (the inferred
    # relational schema is alphabetical, so the string path prints
    # from_json(StructField(balance,... — verified empirically)
    import re

    reparse = [
        m
        for m in re.findall(r"from_json\(StructField\(([\w-]+),", plan)
        if m not in ("data", "control", "metadata")
    ]
    if reparse:
        raise RuntimeError(
            f"explosion still re-parses the payload string: {reparse}"
        )
    return out


ORACLE_CDC_DMS_RELATIONAL = """
SELECT c_custkey AS id,
       c_name AS name,
       CASE WHEN c_custkey % 5 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS segment,
       c_acctbal AS balance,
       TIMESTAMP '2024-01-01 00:00:00' AS gmt_created
FROM customer
WHERE c_custkey % 11 <> 0
"""


def synth_dms_drift_batches(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(batch1, batch2) raw DMS envelope frames for the schema-drift
    fixture: batch 1 inserts every customer with the v1 payload (id,
    name, segment, balance); batch 2 updates ``c_custkey % 5 == 0``
    rows with a payload that ALSO carries a new ``tier`` field — the
    ADD COLUMN shape DMS DDL replication emits mid-stream.  Shared by
    the batch replay (``cdc_dms_schema_drift``) and the live-stream
    variant (``cdc_stream_schema_drift``)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    ts0 = F.lit(_BASE_MS) + k * 1000

    v1 = F.to_json(
        F.struct(
            k.alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    v2 = F.to_json(
        F.struct(
            k.alias("id"),
            F.col("c_name").alias("name"),
            F.lit("UPDATED").alias("segment"),
            F.col("c_acctbal").alias("balance"),
            F.concat(F.lit("T"), (k % 3).cast("string")).alias("tier"),
        )
    )
    batch1 = _dms_envelope(customer, v1, "insert", ts0, k * 10)
    batch2 = _dms_envelope(
        customer.filter(k % 5 == 0), v2, "update", ts0 + _DAY_MS, k * 10 + 1
    )
    return batch1, batch2


def q_cdc_dms_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DMS replay across a schema change: batch 2 adds a column.

    Batch 1 inserts every customer with the v1 payload (id, name,
    segment, balance); batch 2 updates c_custkey % 5 == 0 rows with a
    payload that ALSO carries a new ``tier`` field — the ADD COLUMN
    shape DMS DDL replication emits mid-stream.  Both batches parse
    through :func:`cdc_redshift_spark.infer.parse_with_evolution`:
    batch 1 infers and caches the v1 schema; batch 2's drift probe
    spots ``tier`` in the raw JSON, widens the cached schema, and
    re-parses, so the merged state carries the new column (NULL for
    never-updated rows) instead of silently dropping it — the gap the
    reference leaves undefined (SURVEY §1.3).
    """
    from cdc_redshift_spark.infer import SchemaCache, parse_with_evolution
    from cdc_redshift_spark.normalize import dms_changeset

    batch1, batch2 = synth_dms_drift_batches(spark, sf_dir)

    cache = SchemaCache()
    keys = ("db", "table", "key")
    state = None
    for raw in (batch1, batch2):
        ch = latest_per_key(dms_changeset(raw, offset_col="offset"), keys=keys)
        rel = parse_with_evolution(cache, "tpch", "customer_cdc", ch)
        state = apply_changeset(state, rel, keys=("key",))
    return state.select(
        F.col("id").alias("id"),
        F.col("name").alias("name"),
        F.col("segment").alias("segment"),
        F.col("balance").alias("balance"),
        F.col("tier").alias("tier"),
    )


ORACLE_CDC_DMS_SCHEMA_DRIFT = """
SELECT c_custkey AS id,
       c_name AS name,
       CASE WHEN c_custkey % 5 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS segment,
       c_acctbal AS balance,
       CASE WHEN c_custkey % 5 = 0 THEN 'T' || CAST(c_custkey % 3 AS VARCHAR) END AS tier
FROM customer
"""


def synth_mongo_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part.parquet → raw Kafka-shaped frame of Debezium-Mongo envelopes.

    Change rules (part → mongo events), covering the full DocumentDB op
    vocabulary the reference handles (glue_docdb_redshift_cdc.py:133-147):
    - every part          → insert  at base + key s,       offset 10k
    - p_partkey % 3 == 0  → update  at base + key s + 1 d, offset 10k+1
                            (name → 'UPDATED'; fullDocument carries the
                            post-image, i.e. changeStream updateLookup)
    - p_partkey % 4 == 0  → replace at base + key s + 2 d, offset 10k+2
                            (brand → 'Brand#R'; replace maps to update)
    - p_partkey % 9 == 0  → delete  at base + key s + 3 d, offset 10k+3
                            (no fullDocument — tombstone)
    Keys divisible by 12 see update-then-replace (replace wins: later
    ts); divisible by 9 see delete-wins regardless of earlier images.
    """
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    ts0 = F.lit(_BASE_MS) + k * 1000
    null_s = F.lit(None).cast("string")

    def doc(name_col, brand_col):
        return F.to_json(
            F.struct(
                k.cast("string").alias("_id"),
                name_col.alias("name"),
                brand_col.alias("brand"),
                F.col("p_retailprice").alias("price"),
            )
        )

    def envelope(src: DataFrame, op: str, full_doc, ts_ms, off):
        env = F.struct(
            F.concat(F.lit("resume-"), k.cast("string")).alias("_id"),
            F.lit(op).alias("operationType"),
            full_doc.alias("fullDocument"),
            F.struct(
                ts_ms.cast("long").alias("ts_ms"),
                F.lit("false").alias("snapshot"),
            ).alias("source"),
            ts_ms.cast("long").alias("ts_ms"),
            F.struct(
                F.lit("tpch").alias("db"), F.lit("part_cdc").alias("coll")
            ).alias("ns"),
            F.to_json(F.struct(k.cast("string").alias("_id"))).alias("documentKey"),
        )
        return src.select(
            F.to_json(env).alias("value"), off.cast("long").alias("offset")
        )

    inserts = envelope(
        part, "insert", doc(F.col("p_name"), F.col("p_brand")), ts0, k * 10
    )
    updates = envelope(
        part.filter(k % 3 == 0),
        "update",
        doc(F.lit("UPDATED"), F.col("p_brand")),
        ts0 + _DAY_MS,
        k * 10 + 1,
    )
    replaces = envelope(
        part.filter(k % 4 == 0),
        "replace",
        doc(F.col("p_name"), F.lit("Brand#R")),
        ts0 + 2 * _DAY_MS,
        k * 10 + 2,
    )
    deletes = envelope(
        part.filter(k % 9 == 0), "delete", null_s, ts0 + 3 * _DAY_MS, k * 10 + 3
    )
    return (
        inserts.unionByName(updates).unionByName(replaces).unionByName(deletes)
    )


def q_cdc_mongo_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocumentDB replay: Debezium-Mongo envelope → ChangeSet → LWW
    dedup → merged final state (the glue_docdb_redshift_cdc.py pipeline
    run natively: documentKey $._id key extraction :133, replace→update
    op mapping, delete sentinel :184, ts_ms desc ordering :137)."""
    raw = synth_mongo_changelog(spark, sf_dir)
    changes = mongo_changeset(raw, offset_col="offset")
    deduped = latest_per_key(changes, keys=("db", "table", "key"))
    state = apply_changeset(None, deduped, keys=("db", "table", "key"))
    return state.select(
        F.col("key").cast("bigint").alias("pkey"),
        F.get_json_object("payload", "$.name").alias("name"),
        F.get_json_object("payload", "$.brand").alias("brand"),
        F.get_json_object("payload", "$.price").cast("double").alias("price"),
        F.col("op"),
    )


ORACLE_CDC_MONGO_REPLAY = """
SELECT p_partkey AS pkey,
       CASE WHEN p_partkey % 4 = 0 OR p_partkey % 3 <> 0 THEN p_name
            ELSE 'UPDATED' END AS name,
       CASE WHEN p_partkey % 4 = 0 THEN 'Brand#R' ELSE p_brand END AS brand,
       p_retailprice AS price,
       CASE WHEN p_partkey % 4 = 0 OR p_partkey % 3 = 0 THEN 'update'
            ELSE 'insert' END AS op
FROM part
WHERE p_partkey % 9 <> 0
"""


def q_cdc_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate maintained from the CDC stream itself: the
    per-status (count, sum(total)) rollup of the orders changelog, kept
    fresh purely from retraction deltas (before/after images — the
    base table is never aggregated), applied across TWO micro-batches
    split by offset parity plus a replayed duplicate of batch 0 (the
    idempotence marker must no-op it).  The oracle aggregates the
    fully-applied final state directly, so a green row proves
    retraction maintenance ≡ recompute-from-final-state AND that batch
    splits / replays don't change totals."""
    import tempfile

    from cdc_redshift_spark.normalize import pg_retraction_stream
    from cdc_redshift_spark.streaming.rollup import RollupMaintainer

    raw = synth_pg_changelog(spark, sf_dir)

    def prepare(r: DataFrame) -> DataFrame:
        return r.select(
            "sign",
            F.get_json_object("payload", "$.status").alias("status"),
            F.get_json_object("payload", "$.total")
            .cast("decimal(18,4)")
            .alias("total"),
        )

    tmp = tempfile.mkdtemp(prefix="cdc_rollup_gate_")
    m = RollupMaintainer(
        spark,
        tmp,
        prepare,
        time_col=None,
        bucket=None,
        dims=["status"],
        measures={"sum_total": "total"},
    )
    b0 = pg_retraction_stream(
        raw.filter(F.col("offset") % 2 == 0), offset_col="offset"
    )
    b1 = pg_retraction_stream(
        raw.filter(F.col("offset") % 2 == 1), offset_col="offset"
    )
    # plain calls with explicit checks: assert statements vanish under
    # python -O and these updates are load-bearing side effects
    applied0 = m.update(b0, 0)
    replayed = m.update(b0, 0)  # same batch id → must no-op
    applied1 = m.update(b1, 1)
    if not (applied0 and applied1 and not replayed):
        raise RuntimeError(
            f"rollup maintenance sequence broken: {applied0}, "
            f"{replayed}, {applied1}"
        )
    out = m.current()
    return out.select(
        "status",
        F.col("n").cast("long").alias("n"),
        F.col("sum_total").cast("double").alias("sum_total"),
    ).orderBy("status")


ORACLE_CDC_ROLLUP = """
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
         o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
)
GROUP BY status
ORDER BY status
"""


def q_sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel through the versioned ParquetSink: commit
    orders as v1, apply an update+delete changeset to make v2, then
    read BOTH versions (`read_table(version=)`) and aggregate each —
    the `VERSION AS OF` contract a transactional table format
    provides, expressed over the sink's hard-linked snapshot
    directories.  Also exercises the retention contract: after the
    reads, `vacuum(keep_last=1)` must drop exactly v1 and keep the
    current pointer readable.  The oracle reconstructs both states
    from the base table, so a green row certifies version isolation
    (the v1 read is unaffected by the v2 commit).  Money rides as
    exact integer cents."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    mo = F.pmod(F.col("k"), F.lit(10))
    nxt = (
        base.where(mo == 1)
        .withColumn("status", F.lit("X"))
        .unionByName(base.where(mo == 0).withColumn("op", F.lit("delete")))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    )
    root = tempfile.mkdtemp(prefix="time_travel_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)
        sink.apply_changeset("db", "t", nxt)
        vs = sink.versions("db", "t")
        if vs != [1, 2]:
            raise RuntimeError(f"expected snapshots [1, 2], got {vs}")
        v1 = sink.read_table(spark, "db", "t", version=1)
        v2 = sink.read_table(spark, "db", "t")

        def agg(df: DataFrame, v: int) -> DataFrame:
            return df.groupBy(
                F.lit(v).alias("version"), F.col("status")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )

        out = (
            agg(v1, 1)
            .unionByName(agg(v2, 2))
            .orderBy("version", "status")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
        dropped = sink.vacuum("db", "t", keep_last=1)
        left = sink.versions("db", "t")
        still = sink.read_table(spark, "db", "t")
        if dropped != [1] or left != [2] or still is None:
            raise RuntimeError(
                f"vacuum contract broken: dropped={dropped}, kept={left}"
            )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_sink_restore_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE + zero-copy CLONE on the versioned sink: commit orders
    as v1, a changeset as v2, `restore(1)` as v3 (hard-links only),
    CLONE the restored table, then keep writing to the source (v4) and
    vacuum it down to one version — the clone must stay readable
    because hard links keep shared bytes alive (the dangling-reference
    hazard Delta shallow clones carry, closed by construction).
    In-query proofs: restore is a new commit (versions [1,2,3]),
    restore-to-current is a no-op, the clone's files share inodes with
    the source snapshot (zero bytes written), and restored rows report
    `_commit_version` 1 — the manifest inherits the RESTORED version's
    provenance, not the restore commit's.  The oracle reconstructs the
    restored, cloned and post-restore-merged states from the base
    table."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    mo = F.pmod(F.col("k"), F.lit(10))
    nxt = (
        base.where(mo == 1)
        .withColumn("status", F.lit("X"))
        .unionByName(base.where(mo == 0).withColumn("op", F.lit("delete")))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    )
    nxt2 = (
        base.where(mo == 2)
        .withColumn("status", F.lit("Y"))
        .withColumn("ts_ms", F.lit(3).cast("long"))
    )
    root = tempfile.mkdtemp(prefix="restore_clone_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)
        sink.apply_changeset("db", "t", nxt)
        v_after = sink.restore("db", "t", 1)
        if v_after != 3 or sink.versions("db", "t") != [1, 2, 3]:
            raise RuntimeError(
                f"restore must commit a NEW version: v={v_after}, "
                f"versions={sink.versions('db', 't')}"
            )
        if sink.restore("db", "t", 3) != 3 or sink.versions(
            "db", "t"
        ) != [1, 2, 3]:
            raise RuntimeError("restore to current must be a no-op")
        prov = sink.read_table(
            spark, "db", "t", with_commit_version=True
        )
        bad_prov = prov.where(F.col("_commit_version") != 1).count()
        if bad_prov:
            raise RuntimeError(
                f"{bad_prov} restored rows misreport their writing "
                "commit (expected _commit_version=1 for every row)"
            )
        restored = sink.read_table(spark, "db", "t")
        sink.clone_table("db", "t", "db", "t_clone")
        src_dir = _os.path.join(root, "db", "t", "v3")
        clone_dir = _os.path.join(root, "db", "t_clone", "v1")
        for dirpath, _dirs, files in _os.walk(clone_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    if _os.stat(_os.path.join(dirpath, fn)).st_nlink < 2:
                        raise RuntimeError(
                            f"clone wrote new bytes for {fn}: expected "
                            f"a hard link into {src_dir}"
                        )

        def agg(df: DataFrame, tag: str) -> DataFrame:
            return df.groupBy(
                F.lit(tag).alias("tag"), F.col("status")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )

        out_restored = agg(restored, "restored").localCheckpoint(
            eager=True
        )
        # keep writing to the SOURCE after the clone, then vacuum it:
        # the clone must be unaffected by both
        sink.apply_changeset("db", "t", nxt2)
        merged = sink.read_table(spark, "db", "t")
        out_merged = agg(merged, "merged").localCheckpoint(eager=True)
        sink.vacuum("db", "t", keep_last=1)
        clone = sink.read_table(spark, "db", "t_clone")
        out = (
            out_restored.unionByName(out_merged)
            .unionByName(agg(clone, "clone"))
            .orderBy("tag", "status")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_RESTORE_CLONE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
merged AS (
  SELECT k,
         CASE WHEN k % 10 = 2 THEN 'Y' ELSE status END AS status,
         cents
  FROM base
),
lab AS (
  SELECT 'restored' AS tag, status, count(*) AS n,
         sum(cents) AS sum_cents
  FROM base GROUP BY status
  UNION ALL
  SELECT 'merged', status, count(*), sum(cents)
  FROM merged GROUP BY status
  UNION ALL
  SELECT 'clone', status, count(*), sum(cents)
  FROM base GROUP BY status
)
SELECT tag, status, CAST(n AS BIGINT) AS n,
       CAST(sum_cents AS BIGINT) AS sum_cents
FROM lab ORDER BY tag, status
"""


def q_sink_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only ADD / DROP COLUMN through the versioned sink:
    commit orders, ADD a column (hard-link commit, reads as NULL),
    merge a batch populating it, DROP the original status column,
    prove a batch still carrying it RAISES (the _DROPPED guard), then
    RE-ADD status — old files must NOT resurrect their stale status
    bytes (the fresh physical name makes that impossible by
    construction) — and merge updates into the re-added column.
    In-query proofs: the add commit links every data file (inode
    check), the post-add read is all-NULL, the post-re-add read is
    all-NULL again.  The oracle reconstructs the final state from the
    base table."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)
        if sink.add_column("db", "t", "prio", "string") != 2:
            raise RuntimeError("add_column must commit v2")
        v1_dir = _os.path.join(root, "db", "t", "v1")
        v2_dir = _os.path.join(root, "db", "t", "v2")
        for fn in _os.listdir(v2_dir):
            if fn.endswith(".parquet") and not _os.path.samefile(
                _os.path.join(v1_dir, fn), _os.path.join(v2_dir, fn)
            ):
                raise RuntimeError(f"add_column rewrote data file {fn}")
        cur = sink.read_table(spark, "db", "t")
        if cur.where(F.col("prio").isNotNull()).count() != 0:
            raise RuntimeError("added column must read as NULL")
        batch2 = (
            base.where(F.pmod(F.col("k"), F.lit(4)) == 0)
            .withColumn("prio", F.lit("HI"))
            .withColumn("ts_ms", F.lit(2).cast("long"))
            .withColumn("op", F.lit("update"))
        )
        sink.apply_changeset("db", "t", batch2)
        sink.drop_column("db", "t", "status")
        cur = sink.read_table(spark, "db", "t")
        if "status" in cur.columns:
            raise RuntimeError("dropped column still visible")
        try:
            sink.apply_changeset(
                "db", "t", batch2.withColumn("status", F.lit("X"))
            )
            raise RuntimeError(
                "a batch carrying a dropped column must raise"
            )
        except ValueError:
            pass
        sink.add_column("db", "t", "status", "string")
        cur = sink.read_table(spark, "db", "t")
        resurrected = cur.where(F.col("status").isNotNull()).count()
        if resurrected:
            raise RuntimeError(
                f"{resurrected} rows resurrected stale status bytes "
                "after drop + re-add"
            )
        batch3 = (
            cur.where(F.pmod(F.col("k"), F.lit(10)) == 0)
            .withColumn("status", F.lit("Z"))
            .withColumn("ts_ms", F.lit(3).cast("long"))
            .withColumn("op", F.lit("update"))
        )
        sink.apply_changeset("db", "t", batch3)
        fin = sink.read_table(spark, "db", "t")
        out = (
            fin.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
                F.sum(
                    F.when(F.col("prio") == "HI", 1).otherwise(0)
                ).alias("n_hi"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_SCHEMA_EVOLUTION = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
fin AS (
  SELECT k,
         CASE WHEN k % 10 = 0 THEN 'Z' END AS status,
         cents,
         CASE WHEN k % 4 = 0 THEN 'HI' END AS prio
  FROM base
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(CASE WHEN prio = 'HI' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hi
FROM fin GROUP BY status ORDER BY status
"""


def q_orders_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional multi-clause MERGE INTO (plans/merge.merge_into):
    the full Delta-style surface over orders — a delete clause, a
    conditional update (applies only when the source price BEATS the
    stored one, exercising a cross-side predicate), a conditional
    insert, and a not-matched-by-source update flagging cheap stale
    rows — in ONE full-outer join + codegen when/otherwise chains.
    The oracle replays every clause as CASE logic, so a green row
    certifies clause order, per-branch defaults and the cross-side
    conditions."""
    from cdc_redshift_spark.plans.merge import merge_into

    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    k = F.col("k")
    s = (
        t.where(k % 5 == 0).select(
            k,
            F.lit("del").alias("op"),
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("long").alias("cents"),
        )
        .unionByName(
            t.where((k % 3 == 0) & (k % 5 != 0)).select(
                k,
                F.lit("upd").alias("op"),
                F.lit("U").alias("status"),
                (F.col("cents") + (k % 7 - 3) * 100).alias("cents"),
            )
        )
        .unionByName(
            t.where(k % 11 == 0).select(
                (k + 10_000_000).alias("k"),
                F.lit("ins").alias("op"),
                F.lit("N").alias("status"),
                ((k % 997) * 10).cast("long").alias("cents"),
            )
        )
    )
    return (
        merge_into(t, s, ["k"])
        .when_matched_delete(condition="s.op = 'del'")
        .when_matched_update(
            set={"status": "s.status", "cents": "s.cents"},
            condition="s.cents > t.cents",
        )
        .when_not_matched_insert(condition="s.op <> 'del'")
        .when_not_matched_by_source_update(
            set={"status": "'STALE'"}, condition="t.cents < 10000000"
        )
        .execute()
        .orderBy("k")
    )


ORACLE_MERGE_INTO = """
WITH t AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
s AS (
  SELECT k, 'del' AS op, CAST(NULL AS VARCHAR) AS status,
         CAST(NULL AS BIGINT) AS cents
  FROM t WHERE k % 5 = 0
  UNION ALL
  SELECT k, 'upd', 'U', cents + (k % 7 - 3) * 100
  FROM t WHERE k % 3 = 0 AND k % 5 <> 0
  UNION ALL
  SELECT k + 10000000, 'ins', 'N', (k % 997) * 10
  FROM t WHERE k % 11 = 0
),
kept AS (
  SELECT t.k,
         CASE
           WHEN s.k IS NOT NULL AND s.cents > t.cents THEN s.status
           WHEN s.k IS NULL AND t.cents < 10000000 THEN 'STALE'
           ELSE t.status
         END AS status,
         CASE
           WHEN s.k IS NOT NULL AND s.cents > t.cents THEN s.cents
           ELSE t.cents
         END AS cents
  FROM t LEFT JOIN s ON t.k = s.k
  WHERE s.k IS NULL OR s.op <> 'del'
)
SELECT k, status, cents FROM kept
UNION ALL
SELECT k, status, cents FROM s WHERE op = 'ins'
ORDER BY k
"""


def q_sink_column_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY column rename (`ParquetSink.rename_column`, the
    Delta/Iceberg column-mapping contract on plain parquet): commit
    orders as v1, rename `cents` -> `amount_cents` (in-query proof:
    every v2 data file is the SAME inode as v1 — zero bytes
    rewritten), then apply an update+delete changeset ADDRESSED BY THE
    NEW NAME and read the final state.  Also checks time travel to v1
    still serves the pre-rename name.  The oracle reconstructs the
    final state from the base table, so a green row certifies that
    files written before and after the rename merge into one coherent
    logical schema."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="col_rename_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)
        v1_files = sink._data_files(_os.path.join(root, "db", "t", "v1"))
        sink.rename_column("db", "t", "cents", "amount_cents")
        v2_files = sink._data_files(_os.path.join(root, "db", "t", "v2"))
        v1_inodes = {_os.stat(f).st_ino for f in v1_files}
        v2_inodes = {_os.stat(f).st_ino for f in v2_files}
        if v1_inodes != v2_inodes:
            raise RuntimeError(
                "rename rewrote data files: "
                f"{len(v2_inodes - v1_inodes)} new of {len(v2_inodes)}"
            )
        old = sink.read_table(spark, "db", "t", version=1)
        if "cents" not in old.columns or "amount_cents" in old.columns:
            raise RuntimeError(
                f"time travel lost the pre-rename schema: {old.columns}"
            )
        mo = F.pmod(F.col("k"), F.lit(10))
        nxt = (
            base.withColumnRenamed("cents", "amount_cents")
            .where(mo == 1)
            .withColumn(
                "amount_cents", F.col("amount_cents") + F.lit(5)
            )
            .unionByName(
                base.withColumnRenamed("cents", "amount_cents")
                .where(mo == 0)
                .withColumn("op", F.lit("delete"))
            )
            .withColumn("ts_ms", F.lit(2).cast("long"))
        )
        sink.apply_changeset("db", "t", nxt)
        cur = sink.read_table(spark, "db", "t")
        return (
            cur.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amount_cents").alias("sum_amount"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_COLUMN_RENAME = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT k, status,
         CASE WHEN k % 10 = 1 THEN cents + 5 ELSE cents END AS amount_cents
  FROM base WHERE k % 10 <> 0
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(amount_cents) AS BIGINT) AS sum_amount
FROM final GROUP BY status
ORDER BY status
"""



def q_sink_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint enforcement at sink commit
    (`ParquetSink(constraints=)`, the Delta constraint contract):
    orders commit under `cents >= 0` and `status IS NOT NULL`; a
    violating changeset must raise BEFORE any commit work and leave
    the table bit-identical (version pointer asserted in-query), then
    a valid update batch lands normally.  Null expression results
    pass (SQL CHECK semantics) and delete tombstones are exempt.  The
    oracle recomputes the final state, certifying the rejected batch
    truly left no trace."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import (
        ConstraintViolation,
        ParquetSink,
    )

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="constraints_")
    try:
        sink = ParquetSink(
            spark,
            root,
            keys=("k",),
            constraints={
                "cents_nonneg": "cents >= 0",
                "status_not_null": "status IS NOT NULL",
            },
        )
        sink.apply_changeset("db", "t", base)
        bad = (
            base.where(F.pmod(F.col("k"), F.lit(10)) == 3)
            .withColumn("cents", -F.col("cents"))
            .withColumn("ts_ms", F.lit(2).cast("long"))
        )
        try:
            sink.apply_changeset("db", "t", bad)
            raise RuntimeError("violating batch was accepted")
        except ConstraintViolation:
            pass
        if sink._latest_version("db", "t") != 1:
            raise RuntimeError("rejected batch still committed a version")
        good = (
            base.where(F.pmod(F.col("k"), F.lit(10)) == 3)
            .withColumn("cents", F.col("cents") + F.lit(7))
            .withColumn("ts_ms", F.lit(2).cast("long"))
        )
        sink.apply_changeset("db", "t", good)
        cur = sink.read_table(spark, "db", "t")
        return (
            cur.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_CONSTRAINTS = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT k, status,
         CASE WHEN k % 10 = 3 THEN cents + 7 ELSE cents END AS cents
  FROM base
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM final GROUP BY status
ORDER BY status
"""



def q_sink_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file bin-packing compaction (`ParquetSink.optimize`, the
    Delta OPTIMIZE / Iceberg rewrite_data_files story): orders land
    partitioned by status with deliberately fragmented files
    (explicit 8-way repartition), OPTIMIZE packs every fragmented
    partition to its byte-budget file count.  In-query proofs: the
    packed snapshot has exactly one file per partition, a second
    OPTIMIZE is a version-preserving no-op, and an update changeset
    applied AFTER the compaction still merges correctly.  The oracle
    recomputes the final state, certifying compaction moved bytes but
    changed nothing."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="optimize_")
    try:
        sink = ParquetSink(spark, root, keys=("k",), partition_cols=("status",))
        sink.overwrite("db", "t", base.repartition(8))
        rep = sink.optimize("db", "t")
        n_parts = base.select("status").distinct().count()
        if rep["files_after"] != n_parts or rep["files_before"] <= n_parts:
            raise RuntimeError(f"optimize did not pack: {rep}")
        rep2 = sink.optimize("db", "t")
        if rep2["version"] != rep["version"] or rep2["rewritten"]:
            raise RuntimeError(f"no-op optimize made a version: {rep2}")
        nxt = (
            base.where(F.pmod(F.col("k"), F.lit(10)) == 4)
            .withColumn("cents", F.col("cents") + F.lit(3))
            .withColumn("ts_ms", F.lit(2).cast("long"))
        )
        sink.apply_changeset("db", "t", nxt)
        cur = sink.read_table(spark, "db", "t")
        return (
            cur.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_OPTIMIZE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT k, status,
         CASE WHEN k % 10 = 4 THEN cents + 3 ELSE cents END AS cents
  FROM base
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM final GROUP BY status
ORDER BY status
"""



def q_sink_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS columns (`ParquetSink(generated_cols=)`,
    the Delta contract): the sink derives its `ts_date` PARTITION
    column from the changeset's ts_ms — batches never carry it, the
    partition layout and the pruned merge still work, and a batch
    supplying a WRONG explicit value is rejected (in-query proof).
    The oracle recomputes the final state including the derived
    column."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import (
        ConstraintViolation,
        ParquetSink,
    )

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="gencols_")
    try:
        sink = ParquetSink(
            spark,
            root,
            keys=("k",),
            partition_cols=("ts_month",),
            generated_cols={
                "ts_month": "date_format(timestamp_millis(ts_ms), 'yyyy-MM')"
            },
        )
        sink.apply_changeset("db", "t", base)
        upd = (
            base.where(F.pmod(F.col("k"), F.lit(10)) == 6)
            .withColumn("cents", F.col("cents") + F.lit(11))
            .withColumn("ts_ms", F.col("ts_ms") + F.lit(1))
        )
        sink.apply_changeset("db", "t", upd)
        bad = base.limit(1).withColumn("ts_month", F.lit("2099-01"))
        try:
            sink.apply_changeset("db", "t", bad)
            raise RuntimeError("wrong explicit generated value accepted")
        except ConstraintViolation:
            pass
        cur = sink.read_table(spark, "db", "t")
        return (
            cur.groupBy("ts_month")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("ts_month")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_GENERATED = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         strftime(o_orderdate, '%Y-%m') AS ts_month
  FROM orders
), final AS (
  SELECT k, ts_month,
         CASE WHEN k % 10 = 6 THEN cents + 11 ELSE cents END AS cents
  FROM base
)
SELECT ts_month, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM final GROUP BY ts_month
ORDER BY ts_month
"""



def q_sink_txn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table crash-atomic transaction (`ParquetSink.transaction`):
    a CDC batch fanning out to TWO tables (order state + a per-status
    rollup) publishes all-or-nothing — in-query proofs: mid-transaction
    reads still serve the old state, an ABORTED transaction (simulated
    crash before the intent manifest) leaves both tables untouched,
    and the committed transaction publishes both pointers with no
    pending manifest left behind.  The oracle recomputes both final
    states, certifying the aborted attempt left no trace."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    roll = base.groupBy("status").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("cents").alias("sum_cents"),
    ).select(
        F.col("status").alias("k"), "cnt", "sum_cents",
        F.lit(1).cast("long").alias("ts_ms"),
        F.lit(0).cast("long").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="txn_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        with sink.transaction():
            sink.apply_changeset("db", "orders", base)
            sink.apply_changeset("db", "rollup", roll)
            if sink.read_table(spark, "db", "orders") is not None:
                raise RuntimeError("mid-transaction state leaked")
        upd = (
            base.where(F.pmod(F.col("k"), F.lit(10)) == 2)
            .withColumn("cents", F.col("cents") + F.lit(9))
            .withColumn("ts_ms", F.lit(2).cast("long"))
        )
        try:
            with sink.transaction():
                sink.apply_changeset("db", "orders", upd)
                raise RuntimeError("__crash__")
        except RuntimeError as e:
            if "__crash__" not in str(e):
                raise
        if sink._latest_version("db", "orders") != 1:
            raise RuntimeError("aborted transaction published a version")
        if _os.path.exists(sink._txn_path()):
            raise RuntimeError("aborted transaction left a manifest")
        with sink.transaction():
            sink.apply_changeset("db", "orders", upd)
        cur = sink.read_table(spark, "db", "orders")
        rcur = sink.read_table(spark, "db", "rollup")
        out = (
            cur.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("m"),
            )
            .select(
                F.concat(F.lit("orders:"), F.col("status")).alias("row"),
                "n",
                "m",
            )
            .unionByName(
                rcur.select(
                    F.concat(F.lit("rollup:"), F.col("k")).alias("row"),
                    F.col("cnt").alias("n"),
                    F.col("sum_cents").alias("m"),
                )
            )
            .orderBy("row")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_TXN = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT 'orders:' || status AS row, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN k % 10 = 2 THEN cents + 9 ELSE cents END)
            AS BIGINT) AS m
FROM base GROUP BY status
UNION ALL
SELECT 'rollup:' || status, CAST(count(*) AS BIGINT),
       CAST(sum(cents) AS BIGINT)
FROM base GROUP BY status
ORDER BY row
"""



def q_sink_row_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level commit provenance (`read_table(with_commit_version=
    True)`, the Delta `_commit_version` story): every row reports the
    commit that WROTE its file, derived from the per-snapshot file
    manifest — hard-linked rows keep their original version, so after
    an update touching ONE generated-bucket partition the provenance
    split is exactly updated-bucket -> v2, everything else -> v1.  The
    oracle derives the same split from the update rule, certifying
    the pruned merge rewrote precisely the partition it claimed."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="provenance_")
    try:
        sink = ParquetSink(
            spark,
            root,
            keys=("k",),
            partition_cols=("bkt",),
            generated_cols={"bkt": "CAST(pmod(k, 10) AS STRING)"},
        )
        sink.apply_changeset("db", "t", base)
        upd = (
            base.where(F.pmod(F.col("k"), F.lit(10)) == 5)
            .withColumn("cents", F.col("cents") + F.lit(13))
            .withColumn("ts_ms", F.lit(2).cast("long"))
        )
        sink.apply_changeset("db", "t", upd)
        cur = sink.read_table(spark, "db", "t", with_commit_version=True)
        return (
            cur.groupBy(F.col("_commit_version").alias("commit_v"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("commit_v")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_PROVENANCE = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), tagged AS (
  SELECT CASE WHEN k % 10 = 5 THEN 2 ELSE 1 END AS commit_v,
         CASE WHEN k % 10 = 5 THEN cents + 13 ELSE cents END AS cents
  FROM base
)
SELECT CAST(commit_v AS INTEGER) AS commit_v,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM tagged GROUP BY commit_v
ORDER BY commit_v
"""


def q_sink_dv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION-VECTOR merge mode (`ParquetSink(merge_mode='dv')`):
    orders committed as v1, then TWO changesets (status updates +
    deletes, then overlapping re-updates) applied WITHOUT rewriting a
    single existing data file — superseded rows are masked by the
    ``_DV`` (file, pos) sidecar and only batch winners append.
    In-query proof: every v1 data file is the SAME inode in v3
    (hard-link check over all of them), and the sidecar holds exactly
    one mask per superseded row (first-batch updates + deletes +
    second-batch re-updates).  The oracle reconstructs the final
    state from the base table, so a green row certifies the
    read-time anti-join reproduces the rewrite-merge semantics
    exactly — Delta/Iceberg deletion-vector economics on plain
    parquet."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    mo = F.pmod(F.col("k"), F.lit(10))
    ch1 = (
        base.where(mo == 2)
        .withColumn("status", F.lit("U"))
        .withColumn("op", F.lit("update"))
        .unionByName(base.where(mo == 3).withColumn("op", F.lit("delete")))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    )
    ch2 = (
        base.where(F.pmod(F.col("k"), F.lit(20)) == 2)
        .withColumn("status", F.lit("V"))
        .withColumn("op", F.lit("update"))
        .withColumn("ts_ms", F.lit(3).cast("long"))
    )
    root = tempfile.mkdtemp(prefix="sink_dv_")
    try:
        sink = ParquetSink(spark, root, keys=("k",), merge_mode="dv")
        sink.apply_changeset("db", "t", base)
        sink.apply_changeset("db", "t", ch1)
        sink.apply_changeset("db", "t", ch2)
        tdir = _os.path.join(root, "db", "t")
        v1_files = [
            f
            for f in _os.listdir(_os.path.join(tdir, "v1"))
            if f.endswith(".parquet")
        ]
        if not v1_files:
            raise RuntimeError("no v1 data files written")
        for f in v1_files:
            if not _os.path.samefile(
                _os.path.join(tdir, "v1", f), _os.path.join(tdir, "v3", f)
            ):
                raise RuntimeError(
                    f"DV merge rewrote existing data file {f}"
                )
        n_masked = spark.read.parquet(
            _os.path.join(tdir, "v3", "_DV")
        ).count()
        expect = (
            base.where(mo == 2).count()
            + base.where(mo == 3).count()
            + base.where(F.pmod(F.col("k"), F.lit(20)) == 2).count()
        )
        if n_masked != expect:
            raise RuntimeError(
                f"DV sidecar holds {n_masked} masks, expected {expect}"
            )
        out = (
            sink.read_table(spark, "db", "t")
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_DV = """
WITH state AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 20 = 2 THEN 'V'
              WHEN o_orderkey % 10 = 2 THEN 'U'
              ELSE o_orderstatus END AS status,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % 10 <> 3
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM state
GROUP BY status
ORDER BY status
"""


def q_sink_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-pruned POINT LOOKUP through the committed Bloom index on
    a dv-mode, status-partitioned sink (`lookup_files` +
    `read_files`, new r15): orders committed with a per-file Bloom
    index on the key, then updates (k%10==2) and deletes (k%10==3)
    applied as deletion vectors — no data file rewritten.  Three probe
    keys (the smallest with k%10 in 1/2/3: untouched, updated,
    deleted) resolve through the index to a candidate-file subset and
    are read with FULL table semantics via ``read_files``.

    In-query proofs:
    - PRUNING: the candidate set is strictly smaller than the
      snapshot's data-file population (the index actually skipped
      files);
    - MASKING: a raw per-file read of the same candidates still
      CONTAINS the deleted probe's row (dv economics — the bytes are
      there), while ``read_files`` masks it;
    - the partition column survives the file-level read (basePath
      recovery).

    The oracle reconstructs the probes' final state from the base
    table, so a green row certifies the index→mask→read fast path
    end-to-end."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    mo = F.pmod(F.col("k"), F.lit(10))
    ch = (
        base.where(mo == 2)
        .withColumn("status", F.lit("U"))
        .withColumn("op", F.lit("update"))
        .unionByName(base.where(mo == 3).withColumn("op", F.lit("delete")))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    )
    probes = [
        r["pk"]
        for r in base.where(mo.isin(1, 2, 3))
        .groupBy(mo.alias("m"))
        .agg(F.min("k").alias("pk"))
        .collect()
    ]
    root = tempfile.mkdtemp(prefix="sink_lookup_")
    try:
        sink = ParquetSink(
            spark,
            root,
            keys=("k",),
            merge_mode="dv",
            partition_cols=("status",),
            bloom_index_cols=("k",),
        )
        # spread the base over several files per partition so index
        # pruning has files to skip
        sink.apply_changeset("db", "t", base.repartition(8))
        sink.apply_changeset("db", "t", ch)
        files = sorted(
            {f for pk in probes for f in sink.lookup_files("db", "t", "k", pk)}
        )
        if not files:
            raise RuntimeError("bloom lookup returned no candidate files")
        v = sink._latest_version("db", "t")
        total = len(sink._data_files(_os.path.join(root, "db", "t", f"v{v}")))
        if len(files) >= total:
            raise RuntimeError(
                f"no pruning: {len(files)} candidates of {total} files"
            )
        deleted = [pk for pk in probes if pk % 10 == 3]
        got = sink.read_files("db", "t", files).where(F.col("k").isin(probes))
        raw = (
            spark.read.option(
                "basePath", _os.path.join(root, "db", "t", f"v{v}")
            )
            .parquet(*files)
            .where(F.col("k").isin(deleted))
            .count()
        )
        if raw < 1:
            raise RuntimeError(
                "mask proof vacuous: deleted probe not in candidate files"
            )
        if got.where(F.col("k").isin(deleted)).count() != 0:
            raise RuntimeError("read_files served a DV-masked row")
        out = (
            got.select("k", "status", "cents")
            .orderBy("k")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_POINT_LOOKUP = """
WITH probes AS (
  SELECT min(o_orderkey) AS pk FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT min(o_orderkey) FROM orders WHERE o_orderkey % 10 = 2
  UNION ALL
  SELECT min(o_orderkey) FROM orders WHERE o_orderkey % 10 = 3
), state AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 10 = 2 THEN 'U' ELSE o_orderstatus END
           AS status,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % 10 <> 3
)
SELECT s.k, s.status, s.cents
FROM state s JOIN probes p ON s.k = p.pk
ORDER BY s.k
"""


def q_sink_repartition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SPEC EVOLUTION on the versioned sink
    (`ParquetSink.repartition_table`): orders committed UNPARTITIONED
    (v1, full-rewrite merges), evolved in place to partition by
    ``status`` (v2 — in-query assertion that the new snapshot has
    ``status=`` directories), then a changeset touching only
    status-'F' keys applied — with in-query PROOF the post-evolution
    merge is pruned: every other status partition of v3 is a hard
    link of v2's files, not a rewrite.  The oracle reconstructs the
    final state from the base table, so a green row certifies the
    one-time layout rewrite and the newly-pruned merge both preserve
    content exactly — the Iceberg partition-evolution contract a
    mis-partitioned 100 TB table needs, on plain parquet."""
    import os as _os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    ch = (
        base.where((F.col("status") == "F") & (F.pmod(F.col("k"), F.lit(10)) == 1))
        .withColumn("cents", F.col("cents") + 1)
        .withColumn("ts_ms", F.lit(2).cast("long"))
        .withColumn("op", F.lit("update"))
    )
    root = tempfile.mkdtemp(prefix="repart_evo_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)          # v1, unpartitioned
        sink.repartition_table("db", "t", ["status"])  # v2, by status
        tdir = _os.path.join(root, "db", "t")
        v2_dirs = sorted(
            d for d in _os.listdir(_os.path.join(tdir, "v2"))
            if d.startswith("status=")
        )
        if not v2_dirs:
            raise RuntimeError("evolution did not produce status= dirs")
        sink.apply_changeset("db", "t", ch)            # v3, pruned on status
        for d in v2_dirs:
            if d == "status=F":
                continue
            for f in _os.listdir(_os.path.join(tdir, "v3", d)):
                if not f.endswith(".parquet"):
                    continue
                if not _os.path.samefile(
                    _os.path.join(tdir, "v2", d, f),
                    _os.path.join(tdir, "v3", d, f),
                ):
                    raise RuntimeError(
                        f"post-evolution merge rewrote untouched {d}/{f}"
                    )
        out = (
            sink.read_table(spark, "db", "t")
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_REPARTITION = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), fin AS (
  SELECT k, status,
         CASE WHEN status = 'F' AND k % 10 = 1 THEN cents + 1
              ELSE cents END AS cents
  FROM base
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM fin GROUP BY status ORDER BY status
"""


ORACLE_SINK_TIME_TRAVEL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), v2 AS (
  SELECT k, CASE WHEN k % 10 = 1 THEN 'X' ELSE status END AS status, cents
  FROM base WHERE k % 10 <> 0
)
SELECT * FROM (
  SELECT 1 AS version, status, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY status
  UNION ALL
  SELECT 2 AS version, status, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM v2 GROUP BY status
)
ORDER BY version, status
"""


def q_sink_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed from the versioned sink
    (`ParquetSink.table_changes`): after committing orders as v1 and
    an update+delete changeset as v2, diff the two RETAINED snapshots
    into the row-level changeset they imply — Delta's
    ``table_changes`` contract from plain parquet snapshots, one
    full-outer key join, no transaction log.  The oracle derives the
    same changeset from the base table, so a green row certifies the
    feed is exactly the delta a replica would need (updates carry
    before+after images, deletes surface once, unchanged rows are
    silent)."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    mo = F.pmod(F.col("k"), F.lit(10))
    nxt = (
        base.where(mo == 1)
        .withColumn("status", F.lit("X"))
        .unionByName(base.where(mo == 0).withColumn("op", F.lit("delete")))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    )
    root = tempfile.mkdtemp(prefix="table_changes_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)
        sink.apply_changeset("db", "t", nxt)
        feed = sink.table_changes(spark, "db", "t", from_version=1)
        out = (
            feed.select(
                "k",
                "op",
                F.col("before.status").alias("before_status"),
                F.col("after.status").alias("after_status"),
                F.col("before.cents").alias("before_cents"),
                F.col("after.cents").alias("after_cents"),
            )
            .orderBy("k")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_TABLE_CHANGES = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT k,
       CASE WHEN k % 10 = 0 THEN 'delete' ELSE 'update' END AS op,
       status AS before_status,
       CASE WHEN k % 10 = 0 THEN NULL ELSE 'X' END AS after_status,
       cents AS before_cents,
       CASE WHEN k % 10 = 0 THEN NULL ELSE cents END AS after_cents
FROM base
WHERE k % 10 = 0 OR (k % 10 = 1 AND status <> 'X')
ORDER BY k
"""


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history straight from the Debezium-PG envelope path:
    synth changelog → parse/normalize (``pg_changeset``) → per-key
    validity intervals (``scd2_history``) — the dimension-history
    counterpart of `cdc_pg_replay`'s LWW final state, built from the
    SAME change stream: insert@orderdate, update(+1d, status→'U') on
    every 3rd key, delete(+2d) on every 7th.  ``ts_ms``/``offset``
    are the interval bounds and tiebreak (exact integer epochs), and
    the normalized op vocabulary drives open/close (a delete closes
    without emitting; attrs ride the JSON payload)."""
    from cdc_redshift_spark.operators.incremental import scd2_history

    raw = synth_pg_changelog(spark, sf_dir)
    changes = pg_changeset(raw, offset_col="offset").select(
        F.col("key").cast("bigint").alias("k"),
        "ts_ms",
        "offset",
        "op",
        F.get_json_object("payload", "$.status").alias("status"),
        F.get_json_object("payload", "$.total").cast("double").alias("total"),
    )
    hist = scd2_history(
        changes,
        keys=["k"],
        ts_col="ts_ms",
        attrs=["status", "total"],
        tiebreak=["offset"],
    )
    return hist.select(
        "k",
        "status",
        "total",
        F.col("valid_from").alias("valid_from_ms"),
        F.col("valid_to").alias("valid_to_ms"),
        "is_current",
    ).orderBy("k", "valid_from_ms")


ORACLE_CDC_SCD2 = """
WITH ch AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS total,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS ts, 'insert' AS op,
         o_orderkey * 10 AS off
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'U', o_totalprice,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) + 86400000, 'update',
         o_orderkey * 10 + 1
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, NULL, NULL,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) + 172800000, 'delete',
         o_orderkey * 10 + 2
  FROM orders WHERE o_orderkey % 7 = 0
), w AS (
  SELECT *, lead(ts) OVER (PARTITION BY k ORDER BY ts, off) AS vt
  FROM ch
)
SELECT k, status, total,
       ts AS valid_from_ms, vt AS valid_to_ms, vt IS NULL AS is_current
FROM w
WHERE op <> 'delete'
ORDER BY k, valid_from_ms
"""


def q_sink_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE on the versioned sink (`ParquetSink.analyze`):
    commit orders, compute per-column stats (rows, nulls, exact NDV,
    min, max) in ONE aggregation pass, persist them as the snapshot's
    `_ANALYZE` sidecar, and return what `column_stats()` READS BACK —
    so a green row certifies the stats math AND the JSON round-trip
    of the persisted artifact (the cardinality input a 100 TB planner
    uses for broadcast/skew decisions without re-scanning).  The
    oracle recomputes every statistic straight from the base table.
    Numeric min/max ride as DOUBLE (exact below 2^53), string min/max
    as VARCHAR; each column uses exactly one family."""
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    root = tempfile.mkdtemp(prefix="analyze_")
    try:
        sink = ParquetSink(spark, root, keys=("k",))
        sink.apply_changeset("db", "t", base)
        cols = ["k", "custkey", "status", "priority", "price"]
        sink.analyze("db", "t", cols)
        stats = sink.column_stats("db", "t")
        num = {"k", "custkey", "price"}
        rows = [
            (
                c,
                int(st["n"]),
                int(st["n_null"]),
                int(st["ndv"]),
                float(st["min"]) if c in num else None,
                float(st["max"]) if c in num else None,
                None if c in num else str(st["min"]),
                None if c in num else str(st["max"]),
            )
            for c, st in ((c, stats[c]) for c in cols)
        ]
        return spark.createDataFrame(
            rows,
            "col_name string, n long, n_null long, ndv long, "
            "min_num double, max_num double, min_str string, max_str string",
        ).orderBy("col_name")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _an(col_name, expr, numeric):
    mm = (
        f"CAST(min({expr}) AS DOUBLE) AS min_num, "
        f"CAST(max({expr}) AS DOUBLE) AS max_num, "
        "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
        if numeric
        else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
        f"min({expr}) AS min_str, max({expr}) AS max_str"
    )
    return (
        f"SELECT '{col_name}' AS col_name, CAST(count(*) AS BIGINT) AS n, "
        f"CAST(count(*) - count({expr}) AS BIGINT) AS n_null, "
        f"CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv, {mm} FROM orders"
    )


ORACLE_SINK_ANALYZE = (
    _an("k", "o_orderkey", True)
    + " UNION ALL "
    + _an("custkey", "o_custkey", True)
    + " UNION ALL "
    + _an("status", "o_orderstatus", False)
    + " UNION ALL "
    + _an("priority", "o_orderpriority", False)
    + " UNION ALL "
    + _an("price", "o_totalprice", True)
    + " ORDER BY col_name"
)


def q_sink_occ_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency commit protocol on the versioned sink
    (`ParquetSink(occ=True)`): writer A publishes orders as v1; a
    concurrent writer's CLAIM of v2 is simulated (the exclusive
    `_CLAIM_v2` marker, O_CREAT|O_EXCL-wins); A's next commit must CONFLICT
    rather than silently losing the race (the lost-update guard);
    `clear_orphans` frees the crashed claim (the FSCK contract) and
    the retry lands as v2.  The returned aggregate is over the final
    merged state, so the oracle — base orders with the changeset's
    status flip applied — certifies that the conflicted-then-retried
    commit applied EXACTLY ONCE with no rows lost.  Money rides as
    exact integer cents."""
    import os
    import shutil
    import tempfile

    from cdc_redshift_spark.sinks.parquet_sink import (
        CommitConflictError,
        ParquetSink,
    )

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    flip = (
        base.where(F.pmod(F.col("k"), F.lit(7)) == 3)
        .withColumn("status", F.lit("Z"))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    )
    root = tempfile.mkdtemp(prefix="occ_commit_")
    try:
        sink = ParquetSink(spark, root, keys=("k",), occ=True)
        sink.apply_changeset("db", "t", base)
        # rival claim marker (what a concurrent writer's guard creates)
        open(os.path.join(root, "db", "t", "_CLAIM_v2"), "w").close()
        try:
            sink.apply_changeset("db", "t", flip)
        except CommitConflictError:
            pass
        else:
            raise RuntimeError(
                "expected CommitConflictError under a rival claim"
            )
        if sink.read_table(spark, "db", "t").count() != base.count():
            raise RuntimeError(
                "conflicted commit must leave published state untouched"
            )
        if sink.clear_orphans("db", "t") != [2]:
            raise RuntimeError(
                "clear_orphans must free exactly the rival claim"
            )
        sink.apply_changeset("db", "t", flip)  # retry from fresh state
        if sink.versions("db", "t") != [1, 2]:
            raise RuntimeError("retry must land as v2, linear history")
        out = (
            sink.read_table(spark, "db", "t")
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .orderBy("status")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_SINK_OCC = """
WITH st AS (
  SELECT CASE WHEN o_orderkey % 7 = 3 THEN 'Z' ELSE o_orderstatus END
           AS status,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM st GROUP BY status ORDER BY status
"""


QUERIES = {
    "cdc_pg_replay": q_cdc_pg_replay,
    "cdc_scd2_history": q_cdc_scd2_history,
    "sink_time_travel": q_sink_time_travel,
    "sink_analyze_stats": q_sink_analyze_stats,
    "sink_occ_commit": q_sink_occ_commit,
    "sink_restore_clone": q_sink_restore_clone,
    "sink_schema_evolution": q_sink_schema_evolution,
    "sink_column_rename": q_sink_column_rename,
    "orders_merge_into": q_orders_merge_into,
    "sink_constraints": q_sink_constraints,
    "sink_optimize": q_sink_optimize,
    "sink_generated_columns": q_sink_generated_columns,
    "sink_txn_batch": q_sink_txn_batch,
    "sink_row_provenance": q_sink_row_provenance,
    "sink_table_changes": q_sink_table_changes,
    "sink_repartition_evolution": q_sink_repartition_evolution,
    "sink_dv_merge": q_sink_dv_merge,
    "sink_point_lookup": q_sink_point_lookup,
    "cdc_rollup_maintenance": q_cdc_rollup_maintenance,
    "cdc_lww_dedup": q_cdc_lww_dedup,
    "cdc_variant_payload": q_cdc_variant_payload,
    "cdc_op_counts": q_cdc_op_counts,
    "cdc_dms_relational": q_cdc_dms_relational,
    "cdc_dms_variant_replay": q_cdc_dms_variant_replay,
    "cdc_dms_schema_drift": q_cdc_dms_schema_drift,
    "cdc_mongo_replay": q_cdc_mongo_replay,
}

ORACLES = {
    "cdc_scd2_history": ORACLE_CDC_SCD2,
    "sink_time_travel": ORACLE_SINK_TIME_TRAVEL,
    "sink_analyze_stats": ORACLE_SINK_ANALYZE,
    "sink_occ_commit": ORACLE_SINK_OCC,
    "sink_restore_clone": ORACLE_SINK_RESTORE_CLONE,
    "sink_schema_evolution": ORACLE_SINK_SCHEMA_EVOLUTION,
    "sink_column_rename": ORACLE_SINK_COLUMN_RENAME,
    "orders_merge_into": ORACLE_MERGE_INTO,
    "sink_constraints": ORACLE_SINK_CONSTRAINTS,
    "sink_optimize": ORACLE_SINK_OPTIMIZE,
    "sink_generated_columns": ORACLE_SINK_GENERATED,
    "sink_txn_batch": ORACLE_SINK_TXN,
    "sink_row_provenance": ORACLE_SINK_PROVENANCE,
    "sink_table_changes": ORACLE_SINK_TABLE_CHANGES,
    "sink_repartition_evolution": ORACLE_SINK_REPARTITION,
    "sink_dv_merge": ORACLE_SINK_DV,
    "sink_point_lookup": ORACLE_SINK_POINT_LOOKUP,
    "cdc_pg_replay": ORACLE_CDC_PG_REPLAY,
    "cdc_rollup_maintenance": ORACLE_CDC_ROLLUP,
    "cdc_lww_dedup": ORACLE_CDC_LWW_DEDUP,
    "cdc_variant_payload": ORACLE_CDC_VARIANT_PAYLOAD,
    "cdc_op_counts": ORACLE_CDC_OP_COUNTS,
    "cdc_dms_relational": ORACLE_CDC_DMS_RELATIONAL,
    # same oracle by design: the variant explosion must be
    # indistinguishable from the string explosion downstream
    "cdc_dms_variant_replay": ORACLE_CDC_DMS_RELATIONAL,
    "cdc_dms_schema_drift": ORACLE_CDC_DMS_SCHEMA_DRIFT,
    "cdc_mongo_replay": ORACLE_CDC_MONGO_REPLAY,
}

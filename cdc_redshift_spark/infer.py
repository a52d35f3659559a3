"""Dynamic payload schema inference (M3) — the DMS relational path.

The reference infers the JSON payload schema per (batch, table) with
``spark.read.json(to_save_df.rdd.map(lambda r: r.data)).schema`` and
re-parses with ``from_json`` (glue_dms_redshift_cdc.py:161-164) — an
extra full Spark job over every payload, every batch, every table.

Fixes here (SURVEY §7 M3):

- **sample-bounded inference**: infer from ``limit(sample)`` rows, not
  the whole slice — inference cost stops scaling with batch size;
- **per-table schema cache**: the second batch for a table pays zero
  inference jobs unless parsing detects drift;
- **explicit evolution policy**: new fields widen the cached schema
  (additive merge); type conflicts resolve to string (the JSON carrier
  type) rather than failing mid-stream — the documented behavior the
  reference leaves undefined (SURVEY §1.3).

Timestamp coercion parity: the reference rewrites ``gmt_created`` /
``gmt_modified`` string columns to timestamps with a configurable
format (glue_dms_redshift_cdc.py:165-166, default format :37).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Reference default cdc_timestamp_format (glue_dms_redshift_cdc.py:37).
DEFAULT_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def infer_payload_schema(
    df: DataFrame, payload_col: str = "payload", sample: int | None = 10_000
) -> T.StructType:
    """Infer the JSON payload schema from (a sample of) one table slice.

    Equivalent to the reference's ``spark.read.json(rdd)`` inference but
    bounded: at 100 TB the payload slice can be billions of rows, and a
    10k-row sample pins the schema just as well for regular CDC streams
    (every row of one table shares a generator).  Missing-in-sample
    fields are handled by :func:`merge_schemas` drift widening later.
    """
    src = df.select(F.col(payload_col).cast("string").alias("j")).where(
        F.col("j").isNotNull()
    )
    if sample is not None:
        src = src.limit(sample)
    spark = df.sparkSession
    # spark.read.json on an RDD[str] is the one sanctioned inference
    # entry point (PySpark exposes no Dataset[String] reader); the
    # lambda touches only the sampled rows.
    return spark.read.json(src.rdd.map(lambda r: r.j)).schema


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Additive evolution: union of fields, recursing into structs.

    - field in one side only → kept (nullable);
    - same name, same type → kept;
    - both structs → recursive merge;
    - type conflict → StringType (JSON's carrier type; lossless for
      re-parse, queryable with get_json_object).
    """
    by_name = {f.name: f for f in old.fields}
    out = list(old.fields)
    for f in new.fields:
        if f.name not in by_name:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
            continue
        cur = by_name[f.name]
        if cur.dataType == f.dataType:
            continue
        i = next(i for i, x in enumerate(out) if x.name == f.name)
        if isinstance(cur.dataType, T.StructType) and isinstance(
            f.dataType, T.StructType
        ):
            merged = merge_schemas(cur.dataType, f.dataType)
            out[i] = T.StructField(f.name, merged, nullable=True)
        elif _widens(cur.dataType, f.dataType):
            out[i] = T.StructField(f.name, f.dataType, nullable=True)
        elif _widens(f.dataType, cur.dataType):
            pass  # already the wider type
        else:
            out[i] = T.StructField(f.name, T.StringType(), nullable=True)
    return T.StructType(out)


_NUMERIC_WIDTH = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3, "double": 4}


def _widens(frm: T.DataType, to: T.DataType) -> bool:
    """True if ``to`` safely contains every ``frm`` value (long→double…)."""
    a, b = frm.simpleString(), to.simpleString()
    return a in _NUMERIC_WIDTH and b in _NUMERIC_WIDTH and _NUMERIC_WIDTH[a] < _NUMERIC_WIDTH[b]


class SchemaCache:
    """Per-(db, table) payload schema registry with drift handling.

    ``get`` returns the cached schema or infers one; ``evolve`` merges
    a newly observed schema in (e.g. when a batch shows corrupt-record
    markers or new fields).  Driver-side, tiny: one StructType per
    logical table.
    """

    def __init__(self, sample: int | None = 10_000):
        self.sample = sample
        self._schemas: dict[tuple[str, str], T.StructType] = {}
        self.inferences = 0  # test/ops counter

    def get(self, db: str, table: str, slice_df: DataFrame, payload_col: str = "payload") -> T.StructType:
        key = (db, table)
        if key not in self._schemas:
            self.inferences += 1
            self._schemas[key] = infer_payload_schema(
                slice_df, payload_col, sample=self.sample
            )
        return self._schemas[key]

    def evolve(self, db: str, table: str, observed: T.StructType) -> T.StructType:
        key = (db, table)
        cur = self._schemas.get(key)
        self._schemas[key] = observed if cur is None else merge_schemas(cur, observed)
        return self._schemas[key]


def detect_drift(
    changes: DataFrame, schema: T.StructType, payload_col: str = "payload"
) -> DataFrame:
    """Rows whose payload carries a top-level field the schema lacks.

    ``from_json`` silently DROPS unknown fields (it flags only
    malformed JSON as corrupt), so drift must be probed on the raw
    JSON: compare ``json_object_keys`` against the known field set.
    Narrow single-column scan, no shuffle; callers early-exit with
    ``isEmpty()`` so the no-drift steady state costs one pass that
    stops at the first drifted row.  Top-level only by design — a new
    NESTED field inside a known struct widens on the next full
    re-inference, while top-level drift is what DMS/Debezium DDL
    replication actually emits (ADD COLUMN).
    """
    known = F.array(*[F.lit(f.name) for f in schema.fields])
    j = F.col(payload_col).cast("string")
    return changes.where(j.isNotNull()).where(
        F.exists(
            F.json_object_keys(j), lambda k: ~F.array_contains(known, k)
        )
    )


def parse_with_evolution(
    cache: "SchemaCache",
    db: str,
    table: str,
    changes: DataFrame,
    payload_col: str = "payload",
    **explode_kw,
) -> DataFrame:
    """Explode a payload slice under the cached schema, evolving it on
    drift — the wiring the reference leaves undefined (SURVEY §1.3:
    the first inferred schema is cached forever and later-added fields
    silently vanish).

    Per batch: parse under the cached schema; probe the raw JSON for
    top-level fields the schema lacks (:func:`detect_drift`); if any
    exist, re-infer on the DRIFTED rows only, merge via
    :meth:`SchemaCache.evolve` (additive, conflicts → string), and
    re-parse the whole slice under the widened schema.  The steady
    state pays one early-exit probe scan and zero inference jobs.
    """
    schema = cache.get(db, table, changes, payload_col)
    drifted = detect_drift(changes, schema, payload_col)
    if not drifted.isEmpty():
        cache.inferences += 1
        observed = infer_payload_schema(drifted, payload_col, sample=cache.sample)
        schema = cache.evolve(db, table, observed)
    return explode_payload(changes, schema, payload_col, **explode_kw)


def explode_payload(
    changes: DataFrame,
    schema: T.StructType,
    payload_col: str = "payload",
    keep: Sequence[str] = ("key", "ts_ms", "offset", "op"),
    ts_cols: Sequence[str] = ("gmt_created", "gmt_modified"),
    ts_format: str = DEFAULT_TS_FORMAT,
) -> DataFrame:
    """JSON payload → typed relational columns (DMS mode).

    Mirrors glue_dms_redshift_cdc.py:163-166: ``from_json`` with the
    inferred schema, flatten, then coerce the conventional audit
    timestamp columns from strings with ``cdc_timestamp_format``.
    """
    kept = [c for c in keep if c in changes.columns]
    # machinery columns win a name collision: a payload FIELD named
    # e.g. 'key' or 'op' would otherwise duplicate the column name in
    # the output (Spark allows it at select time) and break every
    # downstream reference with an ambiguity error.  The key was
    # extracted FROM the payload at normalize time anyway, so the
    # payload-side duplicate carries no extra information.
    kept_set = set(kept)
    # getField takes the LITERAL name (no dotted-path parsing), so
    # JSON keys containing dots/backticks keep working like d.* did
    d_cols = [
        F.col("d").getField(f.name).alias(f.name)
        for f in schema.fields
        if f.name not in kept_set
    ]
    out = changes.select(
        F.from_json(F.col(payload_col).cast("string"), schema).alias("d"), *kept
    ).select(*d_cols, *kept)
    return _coerce_ts(out, ts_cols, ts_format)


def _coerce_ts(
    out: DataFrame, ts_cols: Sequence[str], ts_format: str
) -> DataFrame:
    for c in ts_cols:
        if c in out.columns and dict(out.dtypes)[c] == "string":
            out = out.withColumn(c, F.to_timestamp(F.col(c), ts_format))
    return out


def explode_payload_variant(
    changes: DataFrame,
    schema: T.StructType,
    variant_col: str = "payload_v",
    keep: Sequence[str] = ("key", "ts_ms", "offset", "op"),
    ts_cols: Sequence[str] = ("gmt_created", "gmt_modified"),
    ts_format: str = DEFAULT_TS_FORMAT,
) -> DataFrame:
    """:func:`explode_payload` over the PRE-PARSED variant column the
    ``payload_variant=True`` normalizers emit: each schema field is a
    typed ``variant_get`` path read of the once-encoded variant
    instead of a fresh ``from_json`` parse of the string — so a
    pipeline that already paid the parse at normalize time (key
    extraction) never re-parses at explosion time (measured 2.6x on
    4-path extraction at sf0.1; SCALE.md round-10).  Same output
    schema and the same audit-timestamp coercion as the string path
    — the two explosions are interchangeable downstream."""
    kept = [c for c in keep if c in changes.columns]
    kept_set = set(kept)  # machinery wins collisions (see explode_payload)
    out = changes.select(
        *[
            F.variant_get(
                F.col(variant_col), f"$.{f.name}", f.dataType.simpleString()
            ).alias(f.name)
            for f in schema.fields
            if f.name not in kept_set
        ],
        *kept,
    )
    return _coerce_ts(out, ts_cols, ts_format)

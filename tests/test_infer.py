"""Dynamic schema inference (M3): sample-bounded inference, cache,
evolution policy, timestamp coercion parity (SURVEY §1.3, §7 M3)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import types as T

from cdc_redshift_spark.infer import (
    SchemaCache,
    explode_payload,
    infer_payload_schema,
    merge_schemas,
)


def payload_df(spark, docs):
    return spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "payload string"
    )


def test_infer_basic_types(spark):
    df = payload_df(
        spark,
        [
            {"id": 1, "name": "a", "balance": 1.5, "flag": True},
            {"id": 2, "name": "b", "balance": 2.0, "flag": False},
        ],
    )
    sch = infer_payload_schema(df)
    got = {f.name: f.dataType.simpleString() for f in sch.fields}
    assert got == {
        "id": "bigint",
        "name": "string",
        "balance": "double",
        "flag": "boolean",
    }


def test_infer_sample_bound(spark):
    df = payload_df(spark, [{"id": i} for i in range(100)])
    sch = infer_payload_schema(df, sample=5)
    assert [f.name for f in sch.fields] == ["id"]


def test_merge_schemas_additive_and_conflict():
    a = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField("s", T.StructType([T.StructField("x", T.LongType())])),
        ]
    )
    b = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),  # conflict → string
            T.StructField("w", T.DoubleType()),  # new → added
            T.StructField(
                "s", T.StructType([T.StructField("y", T.StringType())])
            ),  # nested new field
        ]
    )
    m = merge_schemas(a, b)
    got = {f.name: f.dataType.simpleString() for f in m.fields}
    assert got["v"] == "string"
    assert got["w"] == "double"
    assert got["s"] == "struct<x:bigint,y:string>"


def test_merge_schemas_numeric_widening():
    a = T.StructType([T.StructField("n", T.LongType())])
    b = T.StructType([T.StructField("n", T.DoubleType())])
    assert merge_schemas(a, b)["n"].dataType == T.DoubleType()
    assert merge_schemas(b, a)["n"].dataType == T.DoubleType()


def test_schema_cache_one_inference_per_table(spark):
    cache = SchemaCache()
    df = payload_df(spark, [{"id": 1}])
    s1 = cache.get("db", "t", df)
    s2 = cache.get("db", "t", payload_df(spark, [{"id": 9, "extra": "x"}]))
    assert s1 == s2  # cache hit — no re-inference
    assert cache.inferences == 1
    evolved = cache.evolve("db", "t", infer_payload_schema(payload_df(spark, [{"id": 1, "extra": "x"}])))
    assert "extra" in [f.name for f in evolved.fields]
    assert cache.inferences == 1


def test_explode_payload_types_and_ts_coercion(spark):
    docs = [
        {"id": 1, "name": "a", "gmt_created": "2024-01-01T10:00:00Z"},
        {"id": 2, "name": "b", "gmt_created": "2024-01-02T00:30:00Z"},
    ]
    df = payload_df(spark, docs)
    changes = df.selectExpr(
        "payload",
        "cast(1 as long) as ts_ms",
        "cast(0 as long) as offset",
        "'insert' as op",
        "'k' as key",
    )
    out = explode_payload(changes, infer_payload_schema(df))
    assert dict(out.dtypes)["gmt_created"] == "timestamp"
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["gmt_created"] == datetime.datetime(2024, 1, 1, 10, 0)
    assert rows[1]["op"] == "insert"


def _changes(spark, docs):
    import json as _json

    return spark.createDataFrame(
        [
            (_json.dumps(d), i, i, "insert", str(d["id"]))
            for i, d in enumerate(docs)
        ],
        "payload string, ts_ms long, offset long, op string, key string",
    )


def test_parse_with_evolution_carries_new_field(spark):
    """A field added in a later batch must survive into the parsed
    output (the reference silently drops it — SURVEY §1.3)."""
    from cdc_redshift_spark.infer import parse_with_evolution

    cache = SchemaCache()
    b1 = _changes(spark, [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    out1 = parse_with_evolution(cache, "db", "t", b1)
    assert "tier" not in out1.columns
    assert cache.inferences == 1

    # batch 2 adds `tier`; the drift probe must widen and re-parse
    b2 = _changes(spark, [{"id": 3, "name": "c", "tier": "gold"}])
    out2 = parse_with_evolution(cache, "db", "t", b2)
    assert "tier" in out2.columns
    assert out2.collect()[0]["tier"] == "gold"
    assert cache.inferences == 2  # one drift re-inference, no more

    # batch 3 has no drift: cached schema reused, zero inference jobs,
    # and the widened schema still applies (tier present, NULL here)
    b3 = _changes(spark, [{"id": 4, "name": "d"}])
    out3 = parse_with_evolution(cache, "db", "t", b3)
    assert "tier" in out3.columns
    assert out3.collect()[0]["tier"] is None
    assert cache.inferences == 2


def test_detect_drift_top_level_only(spark):
    from cdc_redshift_spark.infer import detect_drift

    base = _changes(spark, [{"id": 1, "name": "a"}])
    schema = infer_payload_schema(base)
    assert detect_drift(base, schema).isEmpty()
    drifted = _changes(spark, [{"id": 2, "name": "b", "extra": 1}])
    assert detect_drift(drifted, schema).count() == 1


def test_explode_payload_variant_matches_string_explosion(spark):
    """The variant explosion (variant_get paths over the once-parsed
    payload_v) must be indistinguishable from the from_json string
    explosion downstream — same schema, same values, same audit-ts
    coercion, NULL payloads and missing fields included."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cdc_redshift_spark.infer import (
        explode_payload,
        explode_payload_variant,
    )

    rows = [
        ('{"id": 1, "name": "a", "balance": 1.5, '
         '"gmt_created": "2024-01-02T03:04:05Z"}', "k1", 10, 0, "insert"),
        ('{"id": 2, "name": null, "balance": -2.25}', "k2", 11, 1, "update"),
        (None, "k3", 12, 2, "delete"),          # tombstone: NULL payload
        ('{"id": 4}', "k4", 13, 3, "insert"),   # missing fields -> NULL
    ]
    changes = spark.createDataFrame(
        rows, "payload string, key string, ts_ms long, offset long, op string"
    ).withColumn("payload_v", F.try_parse_json("payload"))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("gmt_created", T.StringType()),
        ]
    )
    s = explode_payload(changes, schema)
    v = explode_payload_variant(changes, schema)
    assert v.schema == s.schema
    nsafe = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, v.collect()), key=nsafe) == sorted(
        map(tuple, s.collect()), key=nsafe
    )


def test_explode_payload_machinery_name_collision(spark):
    """r15 review hunt: a payload FIELD named like a machinery column
    ('key', 'op', ...) used to duplicate the output column name
    (d.* + kept) and break every downstream reference; machinery wins
    the collision, payload-only fields still explode."""
    from cdc_redshift_spark.infer import explode_payload, infer_payload_schema

    cs = spark.createDataFrame(
        [("7", 100, 0, "insert", '{"key": "payload-key", "v": 5}')],
        "key string, ts_ms long, offset long, op string, payload string",
    )
    schema = infer_payload_schema(cs)
    out = explode_payload(cs, schema)
    assert out.columns.count("key") == 1
    row = out.collect()[0]
    assert row["key"] == "7" and row["v"] == 5


def test_explode_payload_dotted_field_names(spark):
    """Field access is literal (getField), so JSON keys containing
    dots keep working exactly as d.* did."""
    from cdc_redshift_spark.infer import explode_payload, infer_payload_schema

    cs = spark.createDataFrame(
        [("7", 100, 0, "insert", '{"a.b": 1, "v": 2}')],
        "key string, ts_ms long, offset long, op string, payload string",
    )
    schema = infer_payload_schema(cs)
    out = explode_payload(cs, schema)
    row = out.collect()[0]
    assert row["a.b"] == 1 and row["v"] == 2

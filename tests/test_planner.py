"""Stats-driven join planning: decisions from persisted ANALYZE stats
and the physical plans they produce."""

import pytest

from cdc_redshift_spark.operators.planner import (
    apply_join_plan,
    estimate_size_bytes,
    join_plan,
)


def _stats(rows, ndv, dtype="bigint", nulls=0):
    return {"k": {"n": rows, "n_null": nulls, "ndv": ndv, "min": 0,
                  "max": rows, "dtype": dtype}}


def test_join_plan_decisions():
    small = _stats(1_000, 1_000)           # 8 KB
    huge = _stats(2_000_000_000, 1_000_000_000)  # 16 GB
    p = join_plan(huge, small, "k")
    assert p["strategy"] == "broadcast_right" and not p["skew_risk"]
    p = join_plan(small, huge, "k")
    assert p["strategy"] == "broadcast_left"
    p = join_plan(huge, huge, "k")
    assert p["strategy"] == "shuffle"
    # mean multiplicity 2e9/1e5 = 20000 per key -> skew risk flagged
    hot = _stats(2_000_000_000, 100_000)
    assert join_plan(hot, huge, "k")["skew_risk"]
    with pytest.raises(ValueError, match="not in left stats"):
        join_plan({"x": small["k"]}, small, "k")


def test_estimate_size_uses_dtype_widths():
    st = {
        "a": {"n": 100, "n_null": 0, "ndv": 100, "min": 0, "max": 1,
              "dtype": "bigint"},
        "b": {"n": 100, "n_null": 0, "ndv": 100, "min": "", "max": "",
              "dtype": "string"},
    }
    assert estimate_size_bytes(st) == 100 * (8 + 24)


def test_apply_join_plan_drives_physical_strategy(spark):
    """The stats-sourced hint must override the scan-time size guess:
    with autoBroadcastJoinThreshold OFF, only our explicit hint can
    produce a BroadcastHashJoin."""
    left = spark.range(0, 10_000).withColumnRenamed("id", "k")
    right = spark.range(0, 100).withColumnRenamed("id", "k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pb = {"strategy": "broadcast_right"}
        plan = (
            apply_join_plan(left, right, "k", pb)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        ps = {"strategy": "shuffle"}
        plan = (
            apply_join_plan(left, right, "k", ps)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan
        with pytest.raises(ValueError, match="unknown strategy"):
            apply_join_plan(left, right, "k", {"strategy": "nope"})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_join_plan_from_real_analyze_sidecar(spark, tmp_path):
    """End-to-end: ANALYZE two sink tables, plan the join from the
    persisted sidecars, and get the broadcast the sizes imply."""
    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink
    from pyspark.sql import functions as F

    sink = ParquetSink(spark, str(tmp_path), keys=("k",))
    fact = spark.range(0, 5_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("fk"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("id").alias("offset"),
        F.lit("insert").alias("op"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("id").alias("offset"),
        F.lit("insert").alias("op"),
    )
    sink.apply_changeset("d", "fact", fact)
    sink.apply_changeset("d", "dim", dim)
    fs = sink.analyze("d", "fact", ["k", "fk"])
    ds = sink.analyze("d", "dim", ["k"])
    # plan fact.fk = dim.k: rename so both sides expose the join key
    p = join_plan({"k": fs["fk"]}, ds, "k", broadcast_threshold=4096)
    assert p["strategy"] == "broadcast_right"
    assert p["mean_multiplicity_left"] == 100.0  # 5000 rows / 50 keys

"""Unit tests for operators/incremental.py: incremental rollup
maintenance equals full recompute on controlled changesets, including
the edge cases the query gate can't isolate (group fully deleted, brand
new bucket, update-only churn, mixed-vocabulary op codes)."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.incremental import (
    apply_rollup_delta,
    incremental_rollup,
    rollup_delta,
)


def _rows(df):
    return {
        (r["bucket_ts"].isoformat(), r["k"]): (r["n"], float(r["s"]))
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def base(spark):
    rows = [
        # (ts, k, v) — two hourly buckets, two keys
        ("2024-01-01 10:05:00", "a", "1.00"),
        ("2024-01-01 10:15:00", "a", "2.00"),
        ("2024-01-01 10:25:00", "b", "4.00"),
        ("2024-01-01 11:05:00", "a", "8.00"),
    ]
    return spark.createDataFrame(rows, "ts string, k string, v string").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "k",
        F.col("v").cast("decimal(18,4)").alias("v"),
    )


def _rollup0(base):
    return base.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts"), "k"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, ts string, k string, v string"
    ).select(
        "op",
        F.col("ts").cast("timestamp").alias("ts"),
        "k",
        F.col("v").cast("decimal(18,4)").alias("v"),
    )


def _maintain(base, ch):
    return incremental_rollup(
        _rollup0(base),
        ch,
        time_col="ts",
        bucket="hour",
        dims=["k"],
        measures={"s": "v"},
    )


def _recompute(base, final_rows_df):
    return _rollup0(final_rows_df)


def test_insert_delete_update_matches_recompute(spark, base):
    ch = _changes(
        spark,
        [
            ("insert", "2024-01-01 10:45:00", "b", "16.00"),
            ("delete", "2024-01-01 10:05:00", "a", "1.00"),
            # update = delete(before) + insert(after)
            ("delete", "2024-01-01 10:15:00", "a", "2.00"),
            ("insert", "2024-01-01 10:15:00", "a", "3.50"),
        ],
    )
    got = _rows(_maintain(base, ch))
    final = spark.createDataFrame(
        [
            ("2024-01-01 10:15:00", "a", "3.50"),
            ("2024-01-01 10:25:00", "b", "4.00"),
            ("2024-01-01 10:45:00", "b", "16.00"),
            ("2024-01-01 11:05:00", "a", "8.00"),
        ],
        "ts string, k string, v string",
    ).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "k",
        F.col("v").cast("decimal(18,4)").alias("v"),
    )
    assert got == _rows(_rollup0(final))


def test_group_fully_deleted_leaves_no_row(spark, base):
    ch = _changes(
        spark,
        [
            ("delete", "2024-01-01 11:05:00", "a", "8.00"),
        ],
    )
    got = _rows(_maintain(base, ch))
    assert ("2024-01-01T11:00:00", "a") not in got
    assert len(got) == 2  # (10h,a) and (10h,b) remain


def test_new_bucket_created(spark, base):
    ch = _changes(spark, [("insert", "2024-01-01 12:30:00", "c", "5.00")])
    got = _rows(_maintain(base, ch))
    assert got[("2024-01-01T12:00:00", "c")] == (1, 5.0)


def test_update_only_churn_preserves_counts(spark, base):
    ch = _changes(
        spark,
        [
            ("delete", "2024-01-01 10:25:00", "b", "4.00"),
            ("insert", "2024-01-01 10:25:00", "b", "6.00"),
        ],
    )
    got = _rows(_maintain(base, ch))
    assert got[("2024-01-01T10:00:00", "b")] == (1, 6.0)
    # untouched groups identical to the base rollup
    base_rows = _rows(_rollup0(base))
    for key in (("2024-01-01T10:00:00", "a"), ("2024-01-01T11:00:00", "a")):
        assert got[key] == base_rows[key]


def test_debezium_single_letter_ops(spark, base):
    """'d' counts as delete; 'c'/'u'/'r' images count as inserts."""
    ch = _changes(
        spark,
        [
            ("d", "2024-01-01 10:05:00", "a", "1.00"),
            ("c", "2024-01-01 10:05:00", "a", "9.00"),
        ],
    )
    got = _rows(_maintain(base, ch))
    assert got[("2024-01-01T10:00:00", "a")] == (2, 11.0)


def test_delta_only_touches_changed_groups(spark, base):
    ch = _changes(spark, [("insert", "2024-01-01 10:45:00", "b", "1.00")])
    d = rollup_delta(
        ch, time_col="ts", bucket="hour", dims=["k"], measures={"s": "v"}
    )
    rows = d.collect()
    assert len(rows) == 1 and rows[0]["k"] == "b" and rows[0]["n"] == 1


def test_apply_is_associative_across_batches(spark, base):
    """Applying two micro-batches sequentially == applying their union
    (decimal measures make this exact, not approximate)."""
    b1 = _changes(spark, [("insert", "2024-01-01 10:45:00", "b", "0.10")])
    b2 = _changes(
        spark,
        [
            ("delete", "2024-01-01 10:25:00", "b", "4.00"),
            ("insert", "2024-01-01 13:00:00", "a", "0.20"),
        ],
    )
    seq = _maintain(base, b2.unionByName(b1))
    step1 = _maintain(base, b1)
    step2 = apply_rollup_delta(
        step1,
        rollup_delta(
            b2, time_col="ts", bucket="hour", dims=["k"], measures={"s": "v"}
        ),
        dims=["k"],
        measures=["s"],
    )
    assert _rows(seq) == _rows(step2)


def test_snapshot_diff_semantics(spark):
    from cdc_redshift_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "p1", 10.0),  # unchanged
            (2, "p1", 20.0),  # changed in place
            (3, "p1", 30.0),  # moved p1 -> p2 (value also differs)
            (4, "p2", 40.0),  # deleted
            (6, "p2", None),  # null value, unchanged (null-safe compare)
        ],
        "k int, part string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "p1", 10.0),
            (2, "p1", 21.0),
            (3, "p2", 31.0),
            (5, "p2", 50.0),  # added
            (6, "p2", None),
        ],
        "k int, part string, v double",
    )
    got = {
        r.partition: (r.n_added, r.n_deleted, r.n_changed, r.n_unchanged)
        for r in snapshot_diff(
            old, new, keys=["k"], partition_col="part", compare_cols=["v"]
        ).collect()
    }
    # p1: row1 unchanged, row2 changed, row3 counted as deleted here
    assert got["p1"] == (0, 1, 1, 1)
    # p2: row3 arrives (added), row4 deleted, row5 added, row6 unchanged
    assert got["p2"] == (2, 1, 0, 1)


def test_snapshot_changes_roundtrip(spark):
    """Applying the emitted changeset to `old` reproduces `new` exactly
    — the generation/application closure."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.incremental import snapshot_changes
    from cdc_redshift_spark.sources.tables import load_table

    od = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    k = F.col("o_orderkey")
    new = (
        od.where(k % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 7 == 0, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            od.where(k % 17 == 0).withColumn("o_orderkey", k + 10_000_000)
        )
    )
    ch = snapshot_changes(
        od, new, keys=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderdate"],
    ).cache()
    touched = ch.select("o_orderkey")
    rebuilt = od.join(touched, "o_orderkey", "left_anti").unionByName(
        ch.where(F.col("op") != "delete").select(
            "o_orderkey",
            F.col("after.o_totalprice").alias("o_totalprice"),
            F.col("after.o_orderdate").alias("o_orderdate"),
        )
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
    ch.unpersist()

"""Survivorship semantics pins for operators/golden.golden_record —
the null-skip and tie-break rules the sf oracles may not exercise."""

from pyspark.sql import functions as F

from cdc_redshift_spark.operators.golden import golden_record


def _run(spark, rows, rules):
    df = spark.createDataFrame(
        rows, "k long, ord long, s string, v double"
    )
    out = golden_record(df, ["k"], ["ord"], rules).collect()
    return {r.k: r for r in out}


def test_latest_skips_nulls(spark):
    # the LAST row has a NULL field — the most-recent NON-NULL wins
    rows = [(1, 1, "a", 1.0), (1, 2, "b", 2.0), (1, 3, None, 3.0)]
    out = _run(spark, rows, {"last_s": ("latest", "s")})
    assert out[1].last_s == "b"


def test_latest_all_null_yields_null(spark):
    rows = [(1, 1, None, 1.0), (1, 2, None, 2.0)]
    out = _run(spark, rows, {"last_s": ("latest", "s")})
    assert out[1].last_s is None


def test_mode_tiebreak_greatest_value(spark):
    # "a" x2, "b" x2 -> tie broken toward the greatest value
    rows = [(1, i, s, 0.0) for i, s in enumerate(["a", "b", "a", "b"])]
    out = _run(spark, rows, {"top_s": ("mode", "s")})
    assert out[1].top_s == "b"


def test_mode_all_null_yields_null(spark):
    rows = [(1, 1, None, 0.0)]
    out = _run(spark, rows, {"top_s": ("mode", "s"), "n": ("count",)})
    assert out[1].top_s is None and out[1].n == 1


def test_longest_tiebreak_and_null_skip(spark):
    rows = [(1, 1, "xx", 0.0), (1, 2, "zz", 0.0), (1, 3, None, 0.0)]
    out = _run(spark, rows, {"long_s": ("longest", "s")})
    assert out[1].long_s == "zz"  # equal length -> greatest value


def test_earliest_and_simple_aggs(spark):
    rows = [(1, 5, None, 9.0), (1, 7, "late", 1.0), (2, 1, "x", 4.0)]
    out = _run(
        spark,
        rows,
        {
            "first_s": ("earliest", "s"),
            "mx": ("max", "v"),
            "mn": ("min", "v"),
            "tot": ("sum", "v"),
            "n": ("count",),
        },
    )
    assert out[1].first_s == "late"  # ord=5 row is null -> skipped
    assert out[1].mx == 9.0 and out[1].mn == 1.0 and out[1].tot == 10.0
    assert out[2].n == 1


def test_unknown_rule_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, "a", 0.0)], "k long, ord long, s string, v double")
    with pytest.raises(ValueError):
        golden_record(df, ["k"], ["ord"], {"x": ("median", "v")})

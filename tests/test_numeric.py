"""round_half_away must agree with BOTH engines' round() on doubles —
including tie boundaries, where Python's builtin banker's rounding
diverges."""

import duckdb
from pyspark.sql import functions as F

from cdc_redshift_spark.functions.numeric import round_half_away

CASES = [
    (0.5, 0), (1.5, 0), (2.5, 0), (-0.5, 0), (-2.5, 0),
    (0.1234565, 6), (-0.1234565, 6), (0.1234575, 6),
    (1.0000005, 6), (123.4567895, 6), (3.14159265358979, 9),
    (-7.0000000005, 9), (0.0, 6),
]


def test_matches_spark_round(spark):
    exprs = [
        F.round(F.lit(x), nd).alias(f"c{i}")
        for i, (x, nd) in enumerate(CASES)
    ]
    got = spark.range(1).select(*exprs).collect()[0]
    for i, (x, nd) in enumerate(CASES):
        assert got[f"c{i}"] == round_half_away(x, nd), (x, nd)


def test_matches_duckdb_round():
    con = duckdb.connect()
    for x, nd in CASES:
        (got,) = con.execute(f"SELECT round({x!r}::DOUBLE, {nd})").fetchone()
        assert got == round_half_away(x, nd), (x, nd)


def test_builtin_round_would_diverge():
    # the reason this helper exists: banker's rounding ties-to-even
    assert round(2.5) == 2 and round_half_away(2.5, 0) == 3.0

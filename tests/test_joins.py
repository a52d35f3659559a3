"""salted_join must be result-equivalent to the plain join."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def fact(spark):
    # key 1 is "hot" (5 of 8 rows); key 4 has no dim match
    rows = [(1, i, 10.0 * i) for i in range(5)] + [
        (2, 0, 1.0),
        (3, 0, 2.0),
        (4, 0, 3.0),
    ]
    return spark.createDataFrame(rows, "k long, seq int, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")], "k long, name string"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("factor", [1, 3, 8])
def test_inner_matches_plain(spark, fact, dim, factor):
    plain = fact.join(dim, "k", "inner")
    salted = salted_join(fact, dim, ["k"], factor=factor, discriminator="seq")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_left_keeps_unmatched(spark, fact, dim):
    plain = fact.join(dim, "k", "left")
    salted = salted_join(
        fact, dim, ["k"], factor=4, discriminator="seq", how="left"
    )
    assert _rows(salted.select(*plain.columns)) == _rows(plain)
    # key 4 survives with a null dim side
    assert any(r["k"] == 4 and r["name"] is None for r in salted.collect())


def test_default_discriminator_and_rejects_bad_how(spark, fact, dim):
    salted = salted_join(fact, dim, ["k"], factor=4)  # whole-row hash
    plain = fact.join(dim, "k", "inner")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")


def test_salt_actually_spreads(spark, fact, dim):
    """The hot key's rows must land in >1 salt bucket (the point of the
    operator); pin it so a hash regression can't silently unsalt."""
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("seq")), F.lit(4)).cast("int")
    )
    n = f.filter(F.col("k") == 1).select("__salt").distinct().count()
    assert n > 1


def test_bloom_prefilter_no_false_negatives(spark):
    """Every big-side row whose key IS in the small set must survive
    the prefilter (no false negatives); the survivor count is bounded
    below by the true matches and the exact-join sandwich returns
    exactly the true semi-join result."""
    from cdc_redshift_spark.operators.joins import bloom_prefilter

    big = spark.range(0, 20_000).withColumnRenamed("id", "k")
    small = spark.range(0, 20_000, 7).withColumnRenamed("id", "k")  # ~2.9k
    pre = bloom_prefilter(big, small, "k")
    n_true = 20_000 // 7 + 1
    survivors = pre.count()
    assert survivors >= n_true
    exact = pre.join(small.distinct(), "k", "left_semi").count()
    assert exact == n_true
    # FP rate at 18 bits/key, k=5 should be well under 5%
    assert survivors - n_true < 0.05 * 20_000

    # empty small side -> empty prefilter, never a crash
    empty = spark.range(0).withColumnRenamed("id", "k")
    assert bloom_prefilter(big, empty, "k").count() == 0

    # NULL keys on the build side are ignored (not a driver crash)
    from pyspark.sql import functions as F

    with_null = small.select(
        F.when(F.col("k") == 0, None).otherwise(F.col("k")).alias("k")
    )
    pre2 = bloom_prefilter(big, with_null, "k")
    assert pre2.where(F.col("k") % 7 == 0).count() >= n_true - 1

    import pytest

    with pytest.raises(ValueError, match="max_filter_mb"):
        bloom_prefilter(big, small, "k", max_filter_mb=0)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_prefilter(big, small, "k", k_hashes=9)
    with pytest.raises(ValueError, match="types differ"):
        bloom_prefilter(
            big, small.select(F.col("k").cast("int").alias("k")), "k"
        )

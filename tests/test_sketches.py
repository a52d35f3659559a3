"""Unit tests for operators/sketches.py.

KMV: lossless mergeability (union of per-part minima == minima of the
union), exact-below-k behavior, and estimator accuracy bounds on a
corpus larger than k.  HLL: merge-of-parts equals whole-input sketch
estimate and the estimate lands within DataSketches' published error
for lgk=12 (<1 % typical; we assert 5 %)."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.sketches import (
    hll_merge_estimate,
    hll_rollup,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def ids(spark):
    # 3 groups: g0 has 40 distinct ids (< k), g1/g2 have 3000 each,
    # overlapping ranges so dedup-under-merge is exercised; each id
    # appears twice to prove distinctness.
    df = spark.range(0, 3000).select(
        F.explode(
            F.array(F.lit("g1"), F.lit("g1"), F.lit("g2"), F.lit("g2"))
        ).alias("g"),
        (F.col("id") + F.when(F.expr("id % 2 = 0"), 0).otherwise(1500)).alias(
            "v"
        ),
        (F.col("id") % 4).alias("part"),
    )
    small = spark.range(0, 40).select(
        F.lit("g0").alias("g"), F.col("id").alias("v"), (F.col("id") % 4).alias("part")
    )
    return df.unionByName(small)


K = 128


def test_kmv_merge_is_lossless(spark, ids):
    """Merging per-part sketches == sketching the whole group."""
    per_part = kmv_sketch(ids, dims=["g", "part"], col="v", k=K)
    merged = kmv_merge(per_part, dims=["g"], k=K)
    whole = kmv_sketch(ids, dims=["g"], col="v", k=K)
    m = {r["g"]: list(r["kmv"]) for r in merged.collect()}
    w = {r["g"]: list(r["kmv"]) for r in whole.collect()}
    assert m == w


def test_kmv_exact_below_k(spark, ids):
    sk = kmv_sketch(ids.filter("g = 'g0'"), dims=["g"], col="v", k=K)
    out = sk.select("g", kmv_estimate(F.col("kmv"), K).alias("est")).collect()
    assert out[0]["est"] == 40.0  # fewer than k distinct -> exact


def test_kmv_estimate_within_bounds(spark, ids):
    """KMV relative error concentrates around 1/sqrt(k-2) (~9 % at
    k=128); assert a loose 3-sigma bound."""
    sk = kmv_sketch(ids, dims=["g"], col="v", k=K)
    ests = {
        r["g"]: r["est"]
        for r in sk.select(
            "g", kmv_estimate(F.col("kmv"), K).alias("est")
        ).collect()
    }
    # g1: ids 0..2998 even ids + odd ids shifted -> distinct count:
    truth = {
        "g1": ids.filter("g='g1'").select("v").distinct().count(),
        "g2": ids.filter("g='g2'").select("v").distinct().count(),
    }
    for g, t in truth.items():
        assert abs(ests[g] - t) / t < 0.27, (g, ests[g], t)


def test_hll_merge_equals_whole(spark, ids):
    per_part = hll_rollup(ids, dims=["g", "part"], col="v", lgk=12)
    merged = hll_merge_estimate(per_part, dims=["g"], lgk=12)
    whole = hll_rollup(ids, dims=["g"], col="v", lgk=12).withColumn(
        "n_est", F.hll_sketch_estimate("hll")
    )
    m = {r["g"]: r["n_est"] for r in merged.collect()}
    w = {r["g"]: r["n_est"] for r in whole.collect()}
    for g in w:
        assert m[g] == pytest.approx(w[g], rel=1e-9), g


def test_hll_estimate_accuracy(spark, ids):
    sk = hll_rollup(ids, dims=["g"], col="v", lgk=12).withColumn(
        "n_est", F.hll_sketch_estimate("hll")
    )
    ests = {r["g"]: r["n_est"] for r in sk.collect()}
    for g in ("g0", "g1", "g2"):
        t = ids.filter(F.col("g") == g).select("v").distinct().count()
        assert abs(ests[g] - t) / t < 0.05, (g, ests[g], t)

"""PageRank operator: hand-computed values, mass conservation,
dangling redistribution, duplicate-edge collapse."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_one_iteration_hand_computed(spark):
    """a→b, a→c, b→c, c→d; d dangling.  After one iteration from the
    uniform start (d=0.85, N=4, dangling mass = r(d) = 0.25):
      r(v) = 0.0375 + 0.85*(in_mass(v) + 0.0625)."""
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")])
    got = _ranks(pagerank(e, iterations=1))
    want = {
        "a": 0.0375 + 0.85 * 0.0625,
        "b": 0.0375 + 0.85 * (0.125 + 0.0625),
        "c": 0.0375 + 0.85 * (0.375 + 0.0625),
        "d": 0.0375 + 0.85 * (0.25 + 0.0625),
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_mass_conserved_and_order(spark):
    """Ranks stay a probability distribution every round (the
    dangling redistribution guarantees it), and the sink node of a
    chain outranks its feeders."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "c"), ("y", "c")])
    for iters in (1, 2, 3, 5):
        got = _ranks(pagerank(e, iterations=iters))
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert max(got, key=got.get) == "c"


def test_pagerank_duplicate_edges_collapse(spark):
    """A multi-edge must not re-weight the uniform out-distribution."""
    once = _ranks(pagerank(_edges(spark, [("a", "b"), ("a", "c")]), 2))
    dup = _ranks(
        pagerank(
            _edges(spark, [("a", "b"), ("a", "b"), ("a", "c")]), 2
        )
    )
    for k in once:
        assert once[k] == pytest.approx(dup[k], abs=1e-12)


def test_pagerank_guards(spark):
    e = _edges(spark, [])
    assert pagerank(e, iterations=1).count() == 0
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
    # NULL endpoints are dropped, not propagated
    e2 = spark.createDataFrame(
        [("a", None), (None, "b"), ("a", "b")], "src string, dst string"
    )
    got = _ranks(pagerank(e2, iterations=1))
    assert set(got) == {"a", "b"}

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


def test_tree_roots_forest_and_cycle(spark):
    """Pointer doubling resolves mixed-depth chains in O(log d) rounds
    and refuses cycles loudly."""
    import pytest as _pytest

    from cdc_redshift_spark.operators.graph import tree_roots

    # forest: 1 and 2 are roots; chain 1<-10<-20<-30<-40; 2<-11
    rows = [
        (1, None), (2, None),
        (10, 1), (20, 10), (30, 20), (40, 30),
        (11, 2),
    ]
    df = spark.createDataFrame(rows, "id long, parent long")
    got = {r.id: (r.root, r.depth) for r in tree_roots(df).collect()}
    assert got == {
        1: (1, 0), 2: (2, 0),
        10: (1, 1), 20: (1, 2), 30: (1, 3), 40: (1, 4),
        11: (2, 1),
    }
    # a 4-deep chain must resolve within 3 doubling rounds (log2 4 = 2,
    # +1 for the resolve hop): max_rounds=3 succeeds where a frontier
    # walk would need 4
    assert tree_roots(df, max_rounds=3).count() == 7

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (9, None)], "id long, parent long"
    )
    with _pytest.raises(ValueError, match="cycle"):
        tree_roots(cyc, max_rounds=6)


def test_tree_roots_rejects_dangling_and_duplicates(spark):
    import pytest as _pytest

    from cdc_redshift_spark.operators.graph import tree_roots

    dangling = spark.createDataFrame(
        [(1, 99), (2, None)], "id long, parent long"
    )
    with _pytest.raises(ValueError, match="dangling"):
        tree_roots(dangling)
    dup = spark.createDataFrame(
        [(1, None), (1, None), (2, 1)], "id long, parent long"
    )
    with _pytest.raises(ValueError, match="duplicate node id"):
        tree_roots(dup)

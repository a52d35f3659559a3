"""Bucketed co-located joins: the big-fact-join scale path.

At 100 TB the orders⋈lineitem join shuffles both sides on every query
unless the tables are bucketed on the join key at write time.  This
pins the contract: bucketed saveAsTable on both sides → the physical
join plan contains NO shuffle (Exchange) above either scan."""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from cdc_redshift_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    spark.sql("create database if not exists bktest")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bktest.orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bktest.lineitem_b")
    )
    yield
    spark.sql("drop database bktest cascade")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    # force a sort-merge join: at test scale Spark would broadcast the
    # small side (also shuffle-free, but it wouldn't exercise bucketing)
    joined = spark.sql(
        """
        select /*+ MERGE(l) */ o.o_orderkey, sum(l.l_extendedprice) as revenue
        from bktest.orders_b o join bktest.lineitem_b l
          on o.o_orderkey = l.l_orderkey
        group by o.o_orderkey
        """
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    # bucketed scans feed the join AND the aggregation with zero
    # repartitioning: no hash-partitioning exchange anywhere
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert joined.count() > 0


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join over plain parquet shuffles both sides —
    proving the assertion above is measuring bucketing, not AQE luck."""
    from cdc_redshift_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    joined = (
        orders.hint("shuffle_hash")
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan

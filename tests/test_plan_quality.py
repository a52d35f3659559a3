"""Physical-plan quality pins for the headline analytics queries.

Correctness is oracle-checked; THESE tests pin the plan shapes the
100 TB design depends on — filter pushdown into the parquet scan,
column pruning, broadcast dims, top-k without a global sort — so a
refactor that silently loses one fails CI, not the cluster bill.
"""

from cdc_redshift_spark.queries.analytics import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(q1_pricing_summary(spark, SF))
    # the shipdate filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan schema (truncated in toString) starts at
    # l_quantity — l_orderkey, the table's first column, was pruned
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert rs.startswith("struct<l_quantity:double")
    # exactly one hash-partition exchange (the groupBy), partial agg map-side
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "partial_sum" in plan


def test_q3_broadcast_dim_and_topk(spark):
    plan = plan_of(q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan  # customer rides as a broadcast dim
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcast_dims(spark):
    plan = plan_of(q5_local_supplier_volume(spark, SF))
    # region/nation/supplier are broadcast; only fact-fact joins shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_decontaminate_broadcasts_eval_side(spark):
    """The benchmark corpus (and the boilerplate keep-list derived from
    it) must ride as broadcasts — the decontamination join costs one
    scan of the training side, no train-side gram shuffle."""
    from cdc_redshift_spark.queries.corpus_q import q_corpus_decontaminate

    plan = plan_of(q_corpus_decontaminate(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    # the only hash exchanges are the count-distinct aggregations (and
    # the tiny eval-side df-cap groupBy) — never the exploded train side
    joins = plan.split("BroadcastHashJoin")[-1]
    assert "SortMergeJoin" not in plan


def test_stratified_sample_is_scan_level_filter(spark):
    """Sampling must stay a codegen filter on the scan: no exchange,
    no Python, and doc_id/source pushed as scan-level IsNotNull."""
    from cdc_redshift_spark.queries.corpus_q import q_corpus_stratified_sample

    plan = plan_of(q_corpus_stratified_sample(spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(1) Filter" in plan  # whole-stage-codegen'd filter on the scan

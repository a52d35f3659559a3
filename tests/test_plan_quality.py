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


def test_q6_full_pushdown(spark):
    """Q6 is the pushdown showcase: every predicate reaches the scan and
    the scan schema carries only the four referenced columns."""
    from cdc_redshift_spark.queries.analytics import q6_revenue_change

    plan = plan_of(q6_revenue_change(spark, SF))
    pushed = plan.split("PushedFilters: ")[1].split("\n")[0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" not in rs and "l_returnflag" not in rs


def test_q14_broadcast_part(spark):
    from cdc_redshift_spark.queries.analytics import q14_promo_revenue

    plan = plan_of(q14_promo_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_single_shuffle_no_join_node(spark):
    """The as-of join must compile to union + ONE keyed window shuffle —
    never a join operator (a range join would plan as
    BroadcastNestedLoopJoin and die at scale)."""
    from cdc_redshift_spark.queries.temporal_q import q_events_asof_attribution

    plan = plan_of(q_events_asof_attribution(spark, SF))
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the user_id window


def test_interval_join_is_equi_join(spark):
    """The bucketed range join must plan as a hash equi-join on cell id,
    never a nested-loop over the raw inequality."""
    from cdc_redshift_spark.queries.temporal_q import q_events_burst_windows

    plan = plan_of(q_events_burst_windows(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_decontaminate_broadcasts_eval_side(spark):
    """Since the Arrow gram-row fast path, both sides are mapInPandas
    (no compile-time stats), so the broadcast decision moves to AQE:
    statically the join must still be a hash equi-join on the gram key
    (never a nested loop), there must be exactly two Arrow passes (one
    per corpus — the df-cap filter is a window, not a third pass), and
    after execution AQE must have converted the small eval side to a
    broadcast."""
    from cdc_redshift_spark.queries.corpus_q import q_corpus_decontaminate

    # this pin asserts PRODUCTION-session AQE behavior, which the
    # latency-tuned test session disables (conftest round 16) — flip it
    # on for this test's scope only
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        df = q_corpus_decontaminate(spark, SF)
        plan = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("MapInPandas") == 2
        df.collect()
        final = plan_of(df)
        assert "isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final  # AQE runtime conversion
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_stratified_sample_is_scan_level_filter(spark):
    """Sampling must stay a codegen filter on the scan: no exchange,
    no Python, and doc_id/source pushed as scan-level IsNotNull."""
    from cdc_redshift_spark.queries.corpus_q import q_corpus_stratified_sample

    # the codegen'd-filter pin asserts PRODUCTION whole-stage codegen,
    # which the latency-tuned test session disables (conftest round 16)
    old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try:
        plan = plan_of(q_corpus_stratified_sample(spark, SF))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "*(1) Filter" in plan  # whole-stage-codegen'd filter
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", old)


def test_source_cap_window_group_limit_both_phases(spark):
    """source_cap's cap must plan as WindowGroupLimit (map-side top-K
    pruning BEFORE each shuffle) in both the salted and final phases —
    the property that bounds shuffled rows at cap per map partition
    even for a dominant source."""
    from cdc_redshift_spark.operators.corpus import source_cap
    from cdc_redshift_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(source_cap(docs, cap=100, salt=8).select("doc_id", "source"))
    # two window phases (salted partial + final), each group-limited,
    # with the partial limit pushed below its exchange
    assert plan.count("WindowGroupLimit") >= 4  # partial+final per phase
    assert "Join" not in plan
    # column pruning propagates THROUGH both window phases: a consumer
    # selecting (doc_id, source) must not drag text through the shuffles
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" not in rs


def test_asof_salted_no_join_explosion(spark):
    """Salted as-of: the carry joinback must be an equi-join on
    (key, bucket) — never a broadcast nested loop — and the plan must
    keep the per-bucket windows (no collapse back to one window over
    the bare key)."""
    from cdc_redshift_spark.operators.temporal import asof_join
    from cdc_redshift_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events").withColumn(
        "e_us", F.expr("ts_ns div 1000")
    )
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "e_us"
    )
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("e_us").alias("c_us"),
        F.col("event_id").alias("click_id"),
    )
    plan = plan_of(
        asof_join(
            left, right, on=["user_id"], left_ts="e_us", right_ts="c_us",
            payload=["click_id"], salt_bucket_len=1_000_000,
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # per-(key,bucket) windows survive: at least one hashpartitioning
    # exchange keyed on both the join key and the bucket column
    assert "__b" in plan


def test_incremental_rollup_two_bounded_shuffles(spark):
    """Incremental maintenance must shuffle only (a) the changed rows
    into group deltas and (b) the tiny group-row union — never rescan
    or re-shuffle base facts, and aggregation must be partial
    (map-side combine) in both phases."""
    from cdc_redshift_spark.queries.incremental_q import (
        q_events_incremental_rollup,
    )

    plan = plan_of(q_events_incremental_rollup(spark, SF))
    # sort for the output ordering adds one rangepartitioning exchange;
    # the maintenance itself gets at most 3 hash exchanges (base rollup,
    # delta fold, merge — AQE may reuse one for the merge)
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_kmv_sketch_rank_limit_pushdown(spark):
    """The sketch build must get Spark's WindowGroupLimit push-down
    (partial top-k BEFORE the per-dims shuffle) so per-group state is
    O(k) — a plain Window+filter materializes whole groups."""
    from cdc_redshift_spark.operators.sketches import kmv_sketch
    from cdc_redshift_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    plan = plan_of(kmv_sketch(ev, dims=["event_type"], col="user_id", k=64))
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_q21_single_fact_aggregation(spark):
    """Q21's multi-exists semantics must stay ONE lineitem pass: a
    broadcast of the orders filter, per-order aggregation, and no
    self-join of the fact table."""
    from cdc_redshift_spark.queries.tpch_q import q21_late_supplier

    plan = plan_of(q21_late_supplier(spark, SF))
    assert plan.count("Scan parquet") <= 3  # lineitem, orders, supplier
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dq_suite_single_pass_per_table(spark):
    """Row-level checks compile into one aggregation over each table;
    RI joins broadcast their key side (never sort-merge at dim size)."""
    from cdc_redshift_spark.queries.dq_q import q_dq_orders_suite

    plan = plan_of(q_dq_orders_suite(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # both RI checks


def test_hist_sketch_single_count_shuffle(spark):
    """The quantile-sketch build must be ONE count aggregation with
    codegen bin ids — no join, no second scan."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.sketches import hist_sketch
    from cdc_redshift_spark.sources.tables import load_table

    od = load_table(spark, SF, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    plan = plan_of(
        hist_sketch(od, dims=["o_orderpriority"], value=F.col("cents"))
    )
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("Join", "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan


def test_snapshot_diff_single_outer_join(spark):
    """snapshot_diff = ONE full-outer join + one partition aggregate;
    neither snapshot may be scanned twice."""
    from cdc_redshift_spark.queries.incremental_q import (
        q_snapshot_partition_diff,
    )

    plan = plan_of(q_snapshot_partition_diff(spark, SF))
    assert "FullOuter" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # orders is read once per snapshot side (old + new's two branches)
    assert plan.count("FileScan parquet") <= 3


def test_fuzzy_join_blocks_never_all_pairs(spark):
    """The ER join must be an equi-join on the block key."""
    from cdc_redshift_spark.queries.dedup_q import q_er_fuzzy_name_pairs

    plan = plan_of(q_er_fuzzy_name_pairs(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_running_windows_single_shuffle(spark):
    """orders_running_windows (round-6 fold): three window specs over
    the same o_custkey partitioning must evaluate with ONE hash
    exchange — if the fold accidentally introduced per-spec shuffles,
    the composite would cost 3x the queries it replaced."""
    from cdc_redshift_spark.queries.analytics import q_orders_running_windows

    plan = plan_of(q_orders_running_windows(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_history_single_window_no_join(spark):
    """SCD2 history = ONE per-key window shuffle, zero join nodes."""
    from cdc_redshift_spark.queries.incremental_q import q_scd2_user_history

    plan = plan_of(q_scd2_user_history(spark, SF))
    assert plan.count("Window") >= 1
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node


def test_scd2_apply_broadcasts_batch_cut(spark):
    """scd2_apply's close step joins the batch's per-key first-ts
    (tiny) BROADCAST against the stored history — the history side
    must never shuffle for the join."""
    from cdc_redshift_spark.queries.incremental_q import (
        q_scd2_incremental_apply,
    )

    plan = plan_of(q_scd2_incremental_apply(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_join_view_delta_broadcasts_both_deltas(spark):
    """Both IVM joins broadcast the DELTA side; neither base table
    shuffles for a join, and nothing degenerates to a cartesian."""
    from cdc_redshift_spark.queries.incremental_q import (
        q_orders_join_view_maintenance,
    )

    plan = plan_of(q_orders_join_view_maintenance(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_plan(spark):
    """BM25: top-k via TakeOrderedAndProject (no global sort), df
    broadcast into scoring, corpus stats as the single allowed 1-row
    broadcast nest, and the tf explode filtered before its shuffle
    (no unfiltered posting explosion = no second corpus-wide
    aggregate beyond tf/df/stats)."""
    from cdc_redshift_spark.queries.corpus_q import q_docs_bm25_topk

    plan = plan_of(q_docs_bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # exactly one 1-row scalar broadcast (corpus stats)
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_scd2_asof_enrich_no_join_node(spark):
    """Point-in-time dimension lookup rides the as-of union+window
    machinery: ZERO join operators anywhere in the plan."""
    from cdc_redshift_spark.queries.incremental_q import (
        q_events_scd2_asof_enrich,
    )

    plan = plan_of(q_events_scd2_asof_enrich(spark, SF))
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node


def test_heavy_hitters_screen_then_semi_join(spark):
    """Two-pass heavy hitters: ONE Arrow screen (mapInPandas), the
    candidate set broadcast into a semi-join, and no full-table
    groupBy before the screen (the count shuffle carries only
    candidate-key rows)."""
    from cdc_redshift_spark.queries.dq_q import q_events_heavy_hitters

    plan = plan_of(q_events_heavy_hitters(spark, SF))
    # the screen output is collected once and recreated as a LOCAL
    # relation (r6 ADVICE: persist() here leaked a cached RDD per
    # call), so the runtime plan carries NO Arrow stage and NO cache
    # scan — the screen's table scan already ran, exactly once, at
    # build time; its three consumers read the local rows
    assert "InMemoryTableScan" not in plan
    assert "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # the 1-row total broadcast is the only nest
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_aqe_coalesces_small_query_despite_wide_initial_partitions():
    """The session factory starts every shuffle at
    initialPartitionNum = max(256, 8*cpus) and relies on AQE to
    coalesce; pin that a small aggregate actually lands on FEW
    shuffle partitions (a host/config regression here would fragment
    every tiny stage into 256 sorters — r6 VERDICT #7)."""
    from cdc_redshift_spark.session import get_spark

    spark = get_spark("aqe-pin-test")
    df = (
        spark.range(10_000)
        .selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k")
        .agg({"v": "sum"})
    )
    df.collect()  # AQE final plan only exists after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan
    # final partition count of the shuffle read must be far below the
    # wide initial number — read it from the final RDD
    n_parts = df.rdd.getNumPartitions()
    assert n_parts <= 16, (
        f"small aggregate fragmented into {n_parts} partitions; "
        f"AQE coalescing lost (plan: {plan[:400]})"
    )


def test_substring_dedup_plan_bounded(spark):
    """Span dedup: no cartesian/nested-loop anywhere, the dup-gram
    filter is a semi-join, and the two island windows share one
    per-doc sort (a second Sort node would mean the lag and the
    running sum each paid their own exchange)."""
    from cdc_redshift_spark.operators.spandedup import duplicated_spans
    from cdc_redshift_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(duplicated_spans(docs, n=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan
    import re

    assert len(re.findall(r"\bSort \[doc_id", plan)) == 1


def test_cm_sketch_broadcasts_and_bounds(spark):
    """CM estimate: the sketch side broadcasts (it is <= d*w rows by
    construction); no cartesian; the build's only wide exchange is
    the (j, bucket) aggregation."""
    from cdc_redshift_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    sk = cm_sketch(df, "k", d=4, w=256)
    probes = spark.createDataFrame([("5",), ("7",)], "k string")
    plan = plan_of(cm_estimate(sk, probes, "k", d=4, w=256))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dsir_broadcasts_bucket_tables(spark):
    """DSIR: bucket-count table broadcast back over the gram stream —
    the per-doc scoring join must never shuffle the grams by bucket.
    Since round-15-opt the count table is collected once (bounded by
    n_buckets) and the corpus-size scalars fold driver-side into plan
    LITERALS, so the old 1-row stats BroadcastNestedLoopJoin is gone
    and the scoring plan runs the gram explode exactly ONCE (the count
    pass is its own bounded action) — three corpus passes became two."""
    from cdc_redshift_spark.queries.corpus_q import q_corpus_dsir_weights

    plan = plan_of(q_corpus_dsir_weights(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # stats are literals now
    # the gram-side scoring join must stay broadcast: a SortMergeJoin
    # keyed on the bucket would shuffle the whole gram stream.  (The
    # final per-doc LEFT attach MAY plan as SortMergeJoin statically —
    # the old BroadcastHashJoin there was an estimate artifact of the
    # removed 1-row stats nest, and broadcasting a doc-count-sized
    # table is the scale-WRONG pick anyway; AQE converts it back to
    # broadcast at runtime when genuinely small.)
    import re

    assert not re.search(r"SortMergeJoin \[__b#", plan)
    # the scoring plan holds exactly one gram explode; a second
    # Generate means a consumer re-evaluated the count-table subtree
    assert plan.count("Generate explode") == 1


def test_dv_read_is_broadcast_anti_join(spark, tmp_path):
    """DV-mode reads mask superseded rows with a BROADCAST anti-join
    on (file, pos) — a sort-merge join here would shuffle the whole
    table per scan and erase the deletion-vector economics."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    sink = ParquetSink(
        spark, str(tmp_path / "dvplan"), keys=("k",), merge_mode="dv"
    )

    def ch(rows, ts):
        return spark.createDataFrame(rows, "k long, val string, op string").select(
            "k", "val", "op",
            F.lit(ts).cast("long").alias("ts_ms"),
            F.col("k").alias("offset"),
        )

    sink.apply_changeset(
        "db", "t", ch([(i, f"v{i}", "insert") for i in range(100)], 1)
    )
    sink.apply_changeset("db", "t", ch([(5, "u", "update")], 2))
    plan = plan_of(sink.read_table(spark, "db", "t"))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_golden_profile_mode_broadcast(spark):
    """The mode (majority-vote) table joins back as a BROADCAST: a
    sort-merge join there would shuffle the key-grain aggregate for a
    table bounded by distinct (key, value) pairs."""
    from cdc_redshift_spark.queries.temporal_q import q_events_golden_profile

    plan = plan_of(q_events_golden_profile(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_perplexity_model_tables_broadcast(spark):
    """Both bigram-LM count tables (<= n_buckets rows by construction)
    must broadcast back onto the transition stream — a sort-merge join
    would shuffle the whole corpus's transitions twice."""
    from cdc_redshift_spark.queries.corpus_q import q_corpus_lm_perplexity

    plan = plan_of(q_corpus_lm_perplexity(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    # neither model-table join may shuffle the transition stream.
    # (The final per-doc LEFT attach MAY plan as SortMergeJoin
    # statically since round-15-opt removed the estimate-poisoning
    # subtree — broadcasting a doc-count-sized table was the
    # scale-wrong pick; AQE re-broadcasts it at runtime when small.)
    import re

    assert not re.search(r"SortMergeJoin \[__b[cg]#", plan)


def test_merge_into_single_join(spark):
    """All five MERGE clauses compile into ONE full-outer join +
    codegen when/otherwise chains — never per-clause joins."""
    from cdc_redshift_spark.queries.cdc import q_orders_merge_into

    plan = plan_of(q_orders_merge_into(spark, SF))
    joins = (
        plan.count("SortMergeJoin")
        + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
    )
    assert joins == 1
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ohlc_single_aggregate_no_window(spark):
    """Ordered picks ride the aggregate: no Window operator, one
    hash-partition exchange for the time-bucket groupBy."""
    from cdc_redshift_spark.queries.temporal_q import q_events_ohlc_bars

    plan = plan_of(q_events_ohlc_bars(spark, SF))
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_phrase_search_zero_exchange(spark):
    """docs_phrase_search must stay scan -> filter -> project: no
    Exchange, no Python/Arrow stage anywhere."""
    from cdc_redshift_spark.queries.corpus_q import q_docs_phrase_search

    plan = plan_of(q_docs_phrase_search(spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan  # no ArrowEvalPython / BatchEvalPython


def test_semantic_dedup_single_cell_shuffle(spark):
    """emb_semantic_dedup: the cell partition is the only wide
    dependency on the pair path (one FlatMapGroupsInPandas over
    cell), and the survivor rule joins the tiny dropped set — never a
    cartesian."""
    from cdc_redshift_spark.queries.similarity import q_emb_semantic_dedup

    plan = plan_of(q_emb_semantic_dedup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_bpe_pair_counts_takeordered(spark):
    """corpus_bpe_pairs: top-k via TakeOrderedAndProject (no global
    Sort), pair stats fully JVM-side (no Python stage)."""
    from cdc_redshift_spark.operators.corpus import bpe_pair_counts
    from cdc_redshift_spark.sources.tables import load_table

    df = bpe_pair_counts(load_table(spark, SF, "documents"), k=30)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_session_paths_single_window_exchange(spark):
    """All three session windows (lag, cumulative sum, lead) must share
    ONE user_id exchange — a second window shuffle would double the
    dominant data movement of path mining at scale."""
    from cdc_redshift_spark.queries.temporal_q import q_events_session_paths

    plan = (
        q_events_session_paths(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    user_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    assert len(user_exchanges) == 1, plan
    assert plan.count("Window") == 3, plan
    assert "TakeOrderedAndProject" in plan


def test_tfidf_broadcast_df_and_no_big_joins(spark):
    """TF-IDF: the vocab-sized df table must BROADCAST back (never a
    big-big SortMergeJoin), N rides a 1-row scalar broadcast, and no
    cartesian anywhere."""
    import __spark_entry__ as e

    plan = (
        e.queries()["docs_tfidf_keywords"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_bloom_semi_prefilter_stays_joinless(spark):
    """The Bloom prefilter must be pure scan-side filtering: exactly
    the one exact semi join in the plan, no cartesian, no BNLJ — the
    bitmap rides the task binary, not a join."""
    import __spark_entry__ as e

    plan = (
        e.queries()["orders_bloom_semi_revenue"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rfm_segments_no_global_window(spark):
    """The round-7 `weak` fix: RFM scoring must carry NO Window node
    at all (the old shape ran three unpartitioned ntile(4) windows —
    three global single-partition sorts over the per-user frame).
    The quartile cut points ride a 1-row broadcast; bins are codegen
    comparisons.  The only permitted exchanges: the per-user groupBy
    and the final presentation sort."""
    import __spark_entry__ as e

    plan = (
        e.queries()["events_rfm_segments"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan  # (percentile is an agg, not ntile)
    # the two 1-row frames (max ts, quartile bounds) ride broadcast
    # nested-loop joins of a single row each -- bounded by construction
    # 3 = max-ts join + bounds join + the max-ts join re-expanded
    # inside the bounds branch; all build sides are single rows and
    # every probe side is the checkpointed per-user frame
    assert plan.count("BroadcastNestedLoopJoin") <= 3, plan
    # per_user is localCheckpoint-ed: the heavy events table is
    # scanned ONCE (inside the checkpoint job); the final plan reads
    # only the materialized per-user frame
    assert plan.count("FileScan") == 0, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_privacy_batch_scorer_plans_bounded(spark):
    """Round-14: the privacy audits' 100 TB shapes, pinned.
    k-anonymity: ONE hash-partition exchange (the QI aggregate) with
    map-side partial counts, violator + mid-replay guard fused into a
    single codegen Filter on the aggregate output — no join, no
    window, no sort.  l-diversity: exactly TWO exchanges (the
    (QI, sensitive) distinct-collapse, then the QI re-aggregate),
    both map-side combined, nothing else."""
    from cdc_redshift_spark.queries.text_q import (
        q_pii_k_anonymity,
        q_pii_l_diversity,
    )

    plan = plan_of(q_pii_k_anonymity(spark, SF))
    body = plan.split("AdaptiveSparkPlan")[-1]
    # one aggregate exchange (+ the final orderBy's range exchange)
    assert body.count("Exchange hashpartitioning") == 1
    assert "partial_count" in body
    # the 0 < n < k guard is ONE fused filter, after the aggregate
    assert "Filter ((n#" in body or "Filter (((n#" in body
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in body, f"unexpected {bad} in k-anonymity plan"

    plan = plan_of(q_pii_l_diversity(spark, SF))
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange hashpartitioning") == 2
    assert "partial_count" in body
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in body, f"unexpected {bad} in l-diversity plan"


def test_t_closeness_scorer_broadcasts_all_reattaches(spark):
    """t-closeness re-attaches the class totals, the global value
    distribution and the 1-row table total onto the observed cells —
    ALL THREE must be broadcast joins (the attach tables are
    aggregate outputs, orders of magnitude smaller than the cells);
    a shuffle join on any of them would re-shuffle the cell grid
    three times at 100 TB."""
    from cdc_redshift_spark.queries.text_q import q_pii_t_closeness

    plan = plan_of(q_pii_t_closeness(spark, SF))
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("BroadcastHashJoin") == 2  # class + global (null-safe keys)
    assert "BroadcastNestedLoopJoin" in body     # the 1-row total attach
    assert "SortMergeJoin" not in body
    assert "ShuffledHashJoin" not in body

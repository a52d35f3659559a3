"""Query library: every entry in ``__spark_entry__.queries()`` lives here.

Each module exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL equivalents; omitted keys get
the driver's weaker rows-only check).

Registry ORDER matters: the external driver's correctness gate checks the
FIRST 50 queries in registry order. ``_GATE_WINDOW`` pins that window;
it ROTATES each round so every query eventually earns a driver-green
correctness row. Round-7 window: the 14 round-6 late additions that
never carried a driver row (SCD2 family, join-view IVM, BM25, sink
time-travel/CDF, Bloom/Z-order layout, heavy hitters, corpus split,
KMV intersection), the round-7 new operators, backfill from the
longest-unrefreshed r4 families, plus the 5 CDC pipelines (re-gated
every round). Queries outside the window (all driver-green in r4-r6
and code-stable since) stay certified via the per-round LOCALGATE
artifact (tools/check_oracle.py over the FULL registry) and pytest.

Round-6 registry hygiene: 12 single-function analytics showcases were
folded into 5 composites with identical function coverage
(first pass 126 + 3 new - 12 + 5 = 122; second pass folded
text_lang_id into text_stats and corpus_repetition_stats +
corpus_novelty into corpus_doc_metrics = 120 entries; see the
`*_profile` / `events_type_stats` / `orders_running_windows` /
`customer_activity_segments` / `cube_sales` / `text_stats` /
`corpus_doc_metrics` docstrings).  Remaining entries are distinct
plan shapes or distinct certified components — further folding would
merge evidence, not demos.
"""

from __future__ import annotations

# Exactly 50 names — the ROUND-11 ROTATION.  With total driver
# coverage reached in r10, rotations are pure staleness refresh;
# tools/rotate_window.py computes the queue from the
# CORRECTNESS_r*.json history, and two overrides apply this round:
#
#   1. NEW queries gate in the round that adds them (standing rule):
#      plan_blowup_probe (the pure-Python CM planner path join_plan
#      actually executes, VERDICT r10 #3), cdc_dms_variant_replay
#      (payload_variant consumed on the full DMS replay, #7), and
#      plan_hot_key_probe (the CM POINT-query path behind the new
#      hot-key mitigation, certified bit-for-bit vs SQL).
#   2. MODIFIED code outranks staleness: the bucketed snapshot store
#      rewrote the Scd2Maintainer and JoinViewMaintainer commit
#      paths, so cdc_scd2_history and cdc_join_view_stream re-gate
#      ahead of the name-order picks.
#
# Composition: the 8 new entries (3 from the first r11 session, the
# drift family — dq_drift_psi, cdc_stream_psi_drift,
# emb_drift_report, corpus_token_drift — plus pii_k_anonymity from
# the second), the 34 longest-stale r6 entries (the r6 cohort minus
# q2/q8/q9/q12/q13/q21/q22 —
# TPC-H family,
# dedup/corpus/streaming-ingest remainders, sketch_hll_users in its
# new full-value register form), 3 r7 entries (cdc_ingest_compaction
# plus the two modified-code re-gates), and the 5 end-to-end CDC
# pipelines (re-gated every round).  Displaced to the head of the
# r12 queue: cdc_op_counts (r7, name-order casualty of override 1),
# q12_ship_delay + q13_order_count_dist (stable-since-r6 TPC-H,
# casualties of override 2 / the third new entry), and
# q8_market_share + q9_product_profit + q2_min_acctbal_supplier +
# q22_inactive_customers + q21_late_supplier (stable-since-r6 TPC-H,
# casualties of the five second-session entries).  Everything outside
# the window stays certified by the
# per-round LOCALGATE artifact over the FULL registry + pytest.
_GATE_WINDOW = [
    "plan_blowup_probe",  # never gated (new r11)
    "cdc_dms_variant_replay",  # never gated (new r11)
    "plan_hot_key_probe",  # never gated (new r11)
    "dq_drift_psi",  # never gated (new r11, second session)
    "pii_k_anonymity",  # never gated (new r11, second session)
    "cdc_stream_psi_drift",  # never gated (new r11, second session)
    "emb_drift_report",  # never gated (new r11, second session)
    "corpus_token_drift",  # never gated (new r11, second session)
    "cdc_ingest_dedup_stream",  # last r6
    "cdc_ingest_neardup_probe",  # last r6
    "cdc_stream_schema_drift",  # last r6
    "corpus_chunk_docs",  # last r6
    "corpus_doc_metrics",  # last r6
    "corpus_pack_stream",  # last r6
    "corpus_weighted_sample",  # last r6
    "cube_sales",  # last r6
    "customer_name_profile",  # last r6
    "dedup_embedding_clusters",  # last r6
    "dedup_incremental_exact",  # last r6
    "dedup_incremental_minhash",  # last r6
    "dedup_simjoin",  # last r6
    "dq_events_skew",  # last r6
    "dq_orders_suite",  # last r6
    "emb_contrastive_negatives",  # last r6
    "er_fuzzy_name_pairs",  # last r6
    "events_funnel_ordered",  # last r6
    "events_incremental_rollup",  # last r6
    "events_type_stats",  # last r6
    "events_user_sequences",  # last r6
    "layout_pruned_scan",  # last r6
    "orders_snapshot_changes",  # last r6
    "q11_important_stock",  # last r6
    "q15_top_supplier",  # last r6
    "q16_supplier_part_counts",  # last r6
    "q17_small_qty_revenue",  # last r6
    "q19_disjunctive_revenue",  # last r6
    "q20_excess_shipments",  # last r6
    "sketch_distinct_users",  # last r6
    "sketch_hll_users",  # last r6
    "sketch_price_quantiles",  # last r6
    "snapshot_partition_diff",  # last r6
    "text_stats",  # last r6
    "cdc_ingest_compaction",  # last r7
    "cdc_scd2_history",  # last r7 (maintainer rewritten r11)
    "cdc_join_view_stream",  # last r7 (maintainer rewritten r11)
    "cdc_pg_replay",  # every round
    "cdc_lww_dedup",  # every round
    "cdc_dms_relational",  # every round
    "cdc_dms_schema_drift",  # every round
    "cdc_mongo_replay",  # every round
]


def all_queries():
    from cdc_redshift_spark.queries import (
        analytics,
        cdc,
        corpus_q,
        dedup_q,
        dq_q,
        graph_q,
        incremental_q,
        layout_q,
        multimodal_q,
        similarity,
        streaming_q,
        temporal_q,
        text_q,
        tpch_q,
    )

    mods = (
        cdc,
        analytics,
        text_q,
        dedup_q,
        corpus_q,
        similarity,
        multimodal_q,
        streaming_q,
        temporal_q,
        incremental_q,
        dq_q,
        graph_q,
        layout_q,
        tpch_q,
    )
    q: dict = {}
    o: dict = {}
    for mod in mods:
        # a duplicate name would silently SHADOW an earlier module's
        # query AND oracle (dict.update) — fail loudly instead
        clash = set(q) & set(mod.QUERIES)
        if clash:
            raise KeyError(
                f"query names in {mod.__name__} shadow earlier modules: "
                f"{sorted(clash)}"
            )
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)

    missing = [n for n in _GATE_WINDOW if n not in q]
    if missing:  # fail loudly: a renamed query must update the window too
        raise KeyError(f"_GATE_WINDOW names not in registry: {missing}")
    ordered = {n: q[n] for n in _GATE_WINDOW}
    ordered.update((n, f) for n, f in q.items() if n not in ordered)
    return ordered, o

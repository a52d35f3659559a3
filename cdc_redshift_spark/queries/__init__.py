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

# Exactly 50 names — the ROUND-12 ROTATION.  With total driver
# coverage reached in r10, rotations are pure staleness refresh;
# tools/rotate_window.py computes the queue from the
# CORRECTNESS_r*.json history, and two overrides apply this round:
#
#   1. NEW queries gate in the round that adds them (standing rule):
#      cdc_rollup_rebucket_stream — maintained state surviving a
#      live bucket-geometry migration (streaming/snapshots rebucket,
#      VERDICT r11 #3), oracled by the full recompute — plus
#      pii_l_diversity and pii_t_closeness (the homogeneity and
#      skewness audits completing the privacy triad with
#      pii_k_anonymity).
#   2. MODIFIED code outranks staleness: the psi contract changed
#      (ADVICE r11 — current-only keys surface as forced-drift rows,
#      NaN exclusion), so dq_drift_psi and cdc_stream_psi_drift
#      re-gate; the snapshot store was rewritten again (token
#      versions + per-version _NBUCKETS + rebucket), so
#      cdc_scd2_history and cdc_join_view_stream re-gate too.
#
# Composition: those 5, the 40 longest-stale entries from
# tools/rotate_window.py's r12 queue (the 7 r6 TPC-H heads displaced
# last round — q2/q8/q9/q12/q13/q21/q22 — plus the r7 cohort in name
# order), and the 5 end-to-end CDC pipelines (re-gated every round).
# Displaced to the head of the r13 queue (the tool's 7 least-stale
# picks, casualties of the overrides): scd2_stream_maintenance,
# scd2_user_history, sink_table_changes, sink_time_travel,
# sketch_user_overlap, supplier_balance_ranks, text_fingerprint
# (all r7, LOCALGATE-green, code-stable).
# Everything outside the window stays certified by the per-round
# LOCALGATE artifact over the FULL registry + pytest.
_GATE_WINDOW = [
    "cdc_rollup_rebucket_stream",  # never gated (new r12)
    "pii_l_diversity",  # never gated (new r12)
    "pii_t_closeness",  # never gated (new r12)
    "dq_drift_psi",  # re-gate: psi contract changed r12 (ADVICE)
    "cdc_stream_psi_drift",  # re-gate: psi contract changed r12
    "cdc_scd2_history",  # re-gate: snapshot store rewritten r12
    "cdc_join_view_stream",  # re-gate: snapshot store rewritten r12
    "q12_ship_delay",  # last r6
    "q13_order_count_dist",  # last r6
    "q21_late_supplier",  # last r6
    "q22_inactive_customers",  # last r6
    "q2_min_acctbal_supplier",  # last r6
    "q8_market_share",  # last r6
    "q9_product_profit",  # last r6
    "cdc_op_counts",  # last r7
    "corpus_split_manifest",  # last r7
    "docs_bm25_topk",  # last r7
    "emb_norm_stats",  # last r7
    "events_heavy_hitters",  # last r7
    "events_props_variant",  # last r7
    "events_retention",  # last r7
    "events_scd2_asof_enrich",  # last r7
    "events_sessionize",  # last r7
    "events_weekday_heatmap",  # last r7
    "graph_pagerank",  # last r7
    "grouping_sets_sales",  # last r7
    "layout_bloom_lookup",  # last r7
    "layout_zorder_scan",  # last r7
    "lineitem_unpivot",  # last r7
    "null_safe_join",  # last r7
    "orders_cheapest_per_cust",  # last r7
    "orders_join_view_maintenance",  # last r7
    "orders_yoy",  # last r7
    "q10_returned_revenue",  # last r7
    "q14_promo_revenue",  # last r7
    "q18_big_orders",  # last r7
    "q1_pricing_summary",  # last r7
    "q3_shipping_priority",  # last r7
    "q4_returned_orders",  # last r7
    "q5_local_supplier_volume",  # last r7
    "q6_revenue_change",  # last r7
    "q7_nation_volume",  # last r7
    "salted_join_orders",  # last r7
    "scd2_incremental_apply",  # last r7
    "scd2_late_repair",  # last r7
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

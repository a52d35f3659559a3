"""Query library: every entry in ``__spark_entry__.queries()`` lives here.

Each module exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL equivalents; omitted keys get
the driver's weaker rows-only check).

Registry ORDER matters: the external driver's correctness gate checks the
FIRST 50 queries in registry order. ``_GATE_WINDOW`` pins that window;
it ROTATES each round so every query eventually earns a driver-green
correctness row. Round-6 window: everything that has never carried a
driver row — the round-5 operator layer, the round-6 additions
(near-dup ingest probe, live-stream schema drift, layout pruning), the
round-6 folded composites — plus the 5 CDC pipelines (re-gated every
round). Queries outside the window (all driver-green in r4/r5 and
code-stable since) stay certified via the per-round LOCALGATE artifact
(tools/check_oracle.py over the FULL registry) and pytest.

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

# Exactly 50 names — the ROUND-6 ROTATION (the r5 window's 50 families
# all landed driver-green in CORRECTNESS_r05, so they rotate out and
# stay certified via LOCALGATE + pytest): every query that has never
# carried a driver row — the round-5 operator layer (simjoin,
# incremental/ingest dedup, chunk/pack/sample, sketches, ER join,
# snapshot diff/changes, rollup maintenance, the 13 round-5 TPC-H plan
# shapes), the round-6 additions (near-dup ingest probe, live-stream
# schema drift, layout pruning), and the round-6 folded composites —
# plus the 5 end-to-end CDC pipelines re-gated every round.
_GATE_WINDOW = [
    # round-5 dedup/similarity operators, LOCALGATE-only until now (6)
    "dedup_simjoin",
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "dedup_embedding_clusters",
    "er_fuzzy_name_pairs",
    "emb_contrastive_negatives",
    # round-5 corpus / packing operators (3)
    "corpus_chunk_docs",
    "corpus_pack_stream",
    "corpus_weighted_sample",
    # round-5 streaming / incremental / CDC-generation operators (6)
    "cdc_ingest_dedup_stream",
    "cdc_rollup_maintenance",
    "events_incremental_rollup",
    "snapshot_partition_diff",
    "orders_snapshot_changes",
    "events_user_sequences",
    # round-5 sketches (3; hll is the documented rows-only entry —
    # register-level pytest oracle, tests/hll_register_mirror.py)
    "sketch_distinct_users",
    "sketch_hll_users",
    "sketch_price_quantiles",
    # round-5 data-quality reports (2)
    "dq_orders_suite",
    "dq_events_skew",
    # round-5 TPC-H plan shapes (13)
    "q2_min_acctbal_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_ship_delay",
    "q13_order_count_dist",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_shipments",
    "q21_late_supplier",
    "q22_inactive_customers",
    # round-6 additions (3)
    "cdc_ingest_neardup_probe",
    "cdc_stream_schema_drift",
    "layout_pruned_scan",
    # round-6 folded composites (new or changed content; 6)
    "customer_name_profile",
    "events_type_stats",
    "orders_running_windows",
    "cube_sales",
    "order_priority_profile",
    "customer_activity_segments",
    # round-6 second-pass folds (changed content; 2)
    "text_stats",
    "corpus_doc_metrics",
    # funnel cross-check riding the spare slot (1)
    # (round-7 rotation queue: the round-6 late additions
    # sketch_user_overlap, layout_zorder_scan, scd2_user_history,
    # scd2_incremental_apply, scd2_stream_maintenance,
    # events_scd2_asof_enrich, orders_join_view_maintenance,
    # docs_bm25_topk, sink_time_travel, sink_table_changes,
    # layout_bloom_lookup, events_heavy_hitters,
    # corpus_split_manifest, and cdc_scd2_history carry LOCALGATE +
    # pytest evidence this round and take window slots next round)
    "events_funnel_ordered",
    # end-to-end CDC pipelines, re-gated every round (5)
    "cdc_pg_replay",
    "cdc_lww_dedup",
    "cdc_dms_relational",
    "cdc_dms_schema_drift",
    "cdc_mongo_replay",
]


def all_queries():
    from cdc_redshift_spark.queries import (
        analytics,
        cdc,
        corpus_q,
        dedup_q,
        dq_q,
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

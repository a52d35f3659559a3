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

# Exactly 50 names — the ROUND-14 ROTATION.  Rotations are pure
# staleness refresh (total driver coverage since r10);
# tools/rotate_window.py computes the queue from the
# CORRECTNESS_r*.json history, with the standing overrides:
#
#   1. NEW queries gate in the round that adds them:
#      cdc_stream_k_anonymity, cdc_stream_l_diversity and
#      cdc_stream_t_closeness — the streaming faces of the FULL
#      privacy triad (maintained QI-class / QI×value counts scored
#      by the shared k_anonymity_score / l_diversity_score /
#      t_closeness_score, VERDICT r13 #4), each exercising a
#      different CDC op (update / sensitive-correction / delete).
#   2. MODIFIED code outranks staleness: emb_drift_score's left-join
#      row-set fix (ADVICE r13) → emb_drift_report,
#      cdc_stream_emb_drift re-gate; the k-anonymity / l-diversity
#      scorer factoring → pii_k_anonymity, pii_l_diversity re-gate;
#      the snapshot store's _flip lost-pointer pruning changed
#      (ADVICE r13) → the store-backed cdc_scd2_history,
#      cdc_join_view_stream, cdc_rollup_rebucket_stream,
#      cdc_rollup_autogrow_stream, cdc_stream_psi_drift,
#      cdc_stream_token_drift re-gate; the long-key fixture
#      assertion relaxed (ADVICE r13) → sketch_hll_users re-gates.
#
# Composition: those 23, the 8 r14 queue heads displaced last round
# (events_rfm_segments, events_session_paths, events_twap,
# graph_tree_roots, layout_range_bounds, orders_bloom_semi_revenue,
# orders_merge_into, sim_ivf_eval — all r9), the remaining 15 of the
# r9 staleness cohort (sim_*, sink_*, sketch_cm_tokens), and the 5 end-to-end CDC pipelines
# (re-gated every round).  After this window NOTHING in the registry
# is staler than r10 (the r13 #2 done-bar).  Displaced to the head
# of the r15 queue: the rest of the r10 cohort in rotate_window
# order (cdc_enrich_stream, cdc_first_seen_stream,
# cdc_rollup_maintenance, cdc_sessionize_stream,
# cdc_stateful_lww_agg_stream, cdc_stateful_lww_stream,
# cdc_variant_payload, cdc_windowed_ops_stream,
# corpus_clean_pipeline, corpus_decontaminate, corpus_source_cap,
# corpus_stratified_sample, corpus_token_shards,
# customer_activity_segments, dedup_clusters, dedup_embedding_cosine,
# dedup_exact, dedup_graph_triangles, dedup_minhash_lsh,
# dedup_ngram_jaccard, dedup_simhash, docs_tfidf_keywords, …).
# Everything outside the window stays certified by the per-round
# LOCALGATE artifact over the FULL registry + pytest.
_GATE_WINDOW = [
    "cdc_stream_k_anonymity",  # never gated (new r14)
    "cdc_stream_l_diversity",  # never gated (new r14)
    "cdc_stream_t_closeness",  # never gated (new r14)
    "emb_drift_report",  # re-gate: left-join row-set fix r14
    "cdc_stream_emb_drift",  # re-gate: left-join row-set fix r14
    "pii_k_anonymity",  # re-gate: shared-scorer factoring r14
    "pii_l_diversity",  # re-gate: shared-scorer factoring r14
    "pii_t_closeness",  # re-gate: shared-scorer factoring r14
    "plan_salted_exec",  # re-gate: derived salt factor r14
    "dedup_simjoin",  # re-gate: float-boundary exactness fix r14
    "dedup_containment",  # re-gate: float-boundary/shingle-n fix r14
    "sketch_user_overlap",  # re-gate: KMV NULL-slot fix r14
    "cdc_stream_kmv_rollup",  # re-gate: KMV NULL-slot fix r14
    "sketch_price_quantiles",  # re-gate: hist NULL-bin fix r14
    "cdc_stream_cm_sketch",  # re-gate: CM depth-bound guard r14
    "cdc_scd2_history",  # re-gate: snapshot _flip pruning r14
    "cdc_join_view_stream",  # re-gate: snapshot _flip pruning r14
    "cdc_rollup_rebucket_stream",  # re-gate: snapshot changes r14
    "cdc_rollup_autogrow_stream",  # re-gate: snapshot changes r14
    "cdc_stream_psi_drift",  # re-gate: snapshot changes r14
    "cdc_stream_token_drift",  # re-gate: snapshot changes r14
    "sketch_hll_users",  # re-gate: fixture assertion relaxed r14
    "events_rfm_segments",  # r14 queue head (last r9)
    "events_session_paths",  # r14 queue head (last r9)
    "events_twap",  # r14 queue head (last r9)
    "graph_tree_roots",  # r14 queue head (last r9)
    "layout_range_bounds",  # r14 queue head (last r9)
    "orders_bloom_semi_revenue",  # r14 queue head (last r9)
    "orders_merge_into",  # r14 queue head (last r9)
    "sim_ivf_eval",  # r14 queue head (last r9)
    "sim_lsh_eval",  # last r9
    "sim_pq_eval",  # last r9
    "sink_analyze_stats",  # last r9
    "sink_column_rename",  # last r9
    "sink_constraints",  # last r9
    "sink_dv_merge",  # last r9
    "sink_generated_columns",  # last r9
    "sink_occ_commit",  # last r9
    "sink_optimize",  # last r9
    "sink_repartition_evolution",  # last r9
    "sink_restore_clone",  # last r9
    "sink_row_provenance",  # last r9
    "sink_schema_evolution",  # last r9
    "sink_txn_batch",  # last r9
    "sketch_cm_tokens",  # last r9
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

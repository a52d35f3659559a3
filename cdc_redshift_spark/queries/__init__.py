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

# Exactly 50 names — the ROUND-13 ROTATION.  With total driver
# coverage reached in r10, rotations are pure staleness refresh;
# tools/rotate_window.py computes the queue from the
# CORRECTNESS_r*.json history, and two overrides apply this round:
#
#   1. NEW queries gate in the round that adds them (standing rule):
#      cdc_stream_emb_drift and cdc_stream_token_drift (the
#      streaming faces of the drift-monitor triad, VERDICT r11 #4),
#      plan_salted_exec (the composed flag→confirm→salted-exec skew
#      path, r11 #5), pii_t_closeness_ordered (the paper's ordered
#      EMD, r12 #6), and cdc_rollup_autogrow_stream (byte-outgrowth-
#      triggered self-migration, r12 #8).
#   2. MODIFIED code outranks staleness: t_closeness_report's joins
#      went null-safe with the oracle mirrored (ADVICE r12 high) →
#      pii_t_closeness re-gates; emb_drift_report now routes through
#      the shared emb_drift_score → re-gates; the HLL oracle mirror
#      gained the murmur3 block rounds and sketch_hll_users a
#      long-key fixture → re-gates; the snapshot store's _flip
#      pruning and empty-state fallback changed (ADVICE r12 lows) →
#      the store-backed cdc_scd2_history, cdc_join_view_stream,
#      cdc_rollup_rebucket_stream, cdc_stream_psi_drift re-gate.
#
# Composition: those 12, the r12 queue heads displaced last round
# (the 7 r7 entries named in the r12 header) plus the rest of the
# tool's staleness order (r7 tail, then the r9 cohort in name
# order), and the 5 end-to-end CDC pipelines (re-gated every round).
# Displaced to the head of the r14 queue (the tool's 8 least-stale
# picks, casualties of the overrides): events_rfm_segments,
# events_session_paths, events_twap, graph_tree_roots,
# layout_range_bounds, orders_bloom_semi_revenue, orders_merge_into,
# sim_ivf_eval (all r9, LOCALGATE-green, code-stable).
# Everything outside the window stays certified by the per-round
# LOCALGATE artifact over the FULL registry + pytest.
_GATE_WINDOW = [
    "cdc_rollup_autogrow_stream",  # never gated (new r13)
    "cdc_stream_emb_drift",  # never gated (new r13)
    "cdc_stream_token_drift",  # never gated (new r13)
    "pii_t_closeness_ordered",  # never gated (new r13)
    "plan_salted_exec",  # never gated (new r13)
    "pii_t_closeness",  # re-gate: null-safe joins r13 (ADVICE)
    "emb_drift_report",  # re-gate: shared-scorer refactor r13
    "sketch_hll_users",  # re-gate: murmur3 block rounds r13
    "cdc_scd2_history",  # re-gate: snapshot _flip/fallback r13
    "cdc_join_view_stream",  # re-gate: snapshot _flip/fallback r13
    "cdc_rollup_rebucket_stream",  # re-gate: snapshot changes r13
    "cdc_stream_psi_drift",  # re-gate: snapshot changes r13
    "corpus_token_drift",  # re-gate: shared vocab/grid helpers r13
    "scd2_stream_maintenance",  # last r7
    "scd2_user_history",  # last r7
    "sink_table_changes",  # last r7
    "sink_time_travel",  # last r7
    "sketch_user_overlap",  # last r7
    "supplier_balance_ranks",  # last r7
    "text_fingerprint",  # last r7
    "text_quality_by_source",  # last r7
    "text_top_words",  # last r7
    "text_winnow",  # last r7
    "top_customers_per_nation",  # last r7
    "cdc_bi_capstone",  # last r9
    "cdc_stream_cm_sketch",  # last r9
    "cdc_stream_ivf_index",  # last r9
    "cdc_stream_kmv_rollup",  # last r9
    "corpus_bpe_pairs",  # last r9
    "corpus_budget_select",  # last r9
    "corpus_dsir_weights",  # last r9
    "corpus_lm_perplexity",  # last r9
    "corpus_pretrain_manifest",  # last r9
    "corpus_split_leakage_safe",  # last r9
    "corpus_temperature_mix",  # last r9
    "dedup_containment",  # last r9
    "docs_hybrid_rrf",  # last r9
    "docs_phrase_search",  # last r9
    "docs_substring_dedup",  # last r9
    "dq_value_outliers",  # last r9
    "dq_value_winsorized",  # last r9
    "emb_pca_projection",  # last r9
    "emb_semantic_dedup",  # last r9
    "events_golden_profile",  # last r9
    "events_ohlc_bars",  # last r9
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

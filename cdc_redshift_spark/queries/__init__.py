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

# Exactly 50 names — the ROUND-9 ROTATION (the r7 window landed
# driver-green in CORRECTNESS_r07 and rotates out; round 8's broken
# registry produced no driver rows, so the round-8 rotation queue is
# executed here unchanged): 42 of the 47 never-driver-gated round-7
# components — the full 13-query sink table-format contract, both
# capstones, the corpus layer (substring dedup, containment, SemDeDup,
# DSIR, LM perplexity, BPE, temperature mix, leakage split, budget
# select, hybrid RRF, phrase search), sketches/stream maintainers, the
# temporal/quality/graph tail — plus the 3 round-8 folded ANN eval
# entries (new names, never gated) and the 5 end-to-end CDC pipelines
# re-gated every round.
#
# ROUND-10 ROTATION QUEUE (deferred this round; each one's operator
# family already carries a gated sibling): docs_tfidf_keywords
# (tf-idf core inside docs_hybrid_rrf), events_resample_interp
# (temporal family: events_ohlc_bars + events_twap gated),
# dq_latency_percentiles (dq family: dq_value_outliers +
# dq_value_winsorized gated), events_pivot_types, layout_zonemap_scan
# (layout family: layout_range_bounds gated) — plus any round-9
# additions.  NOTE: docs_substring_strip from the old queue no longer
# exists; it was folded into docs_substring_dedup (round 8).
_GATE_WINDOW = [
    # sink table-format contract (13)
    "sink_dv_merge",
    "sink_optimize",
    "sink_txn_batch",
    "sink_constraints",
    "sink_column_rename",
    "sink_schema_evolution",
    "sink_repartition_evolution",
    "sink_generated_columns",
    "sink_restore_clone",
    "sink_row_provenance",
    "sink_analyze_stats",
    "sink_occ_commit",
    "orders_merge_into",
    # capstones (2)
    "corpus_pretrain_manifest",
    "cdc_bi_capstone",
    # corpus / dedup layer (12)
    "docs_substring_dedup",
    "dedup_containment",
    "emb_semantic_dedup",
    "corpus_dsir_weights",
    "corpus_lm_perplexity",
    "corpus_bpe_pairs",
    "corpus_temperature_mix",
    "corpus_split_leakage_safe",
    "corpus_budget_select",
    "docs_hybrid_rrf",
    "docs_phrase_search",
    "emb_pca_projection",
    # sketches + streaming maintainers (5)
    "sketch_cm_tokens",
    "sketch_join_size",
    "cdc_stream_cm_sketch",
    "cdc_stream_kmv_rollup",
    "cdc_stream_ivf_index",
    # temporal / quality / graph tail (7)
    "events_ohlc_bars",
    "events_twap",
    "events_session_paths",
    "events_golden_profile",
    "events_rfm_segments",
    "dq_value_outliers",
    "dq_value_winsorized",
    # remaining round-7 components (3)
    "graph_tree_roots",
    "orders_bloom_semi_revenue",
    "layout_range_bounds",
    # round-8 folded ANN eval entries — new names, never gated (3)
    "sim_lsh_eval",
    "sim_ivf_eval",
    "sim_pq_eval",
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

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

# Exactly 50 names — the ROUND-10 ROTATION, the one that FINISHES
# total driver coverage: after this round every registry entry has
# carried a driver row at least once.
#
# ROUND-11 ROTATION QUEUE: with total coverage reached, rotations
# become pure staleness refresh — next window = the 5 CDC pipelines +
# the 45 longest-stale entries by last-gated round (compute from the
# CORRECTNESS_r*.json history; after r10 the oldest cohort is the r6
# remainder, then r7).  Any NEW operator added in round 11 takes a
# slot in the same commit that adds it (the standing rule).  Candidate
# new entry if slots allow: a plan_blowup_probe query gating the
# pure-Python CM inner-product planner path (cm_collect +
# cm_inner_product_cells + noise floor) against duck_cm_inner_product
# — the estimator is pytest-pinned equal to the driver-gated
# DataFrame path today, so this is a nice-to-have, not a gap.
#
# Composition: the 5 never-gated round-10-queue entries + the round-10
# addition (cdc_variant_payload, never gated) + the sketch_join_size
# RE-GATE (the r9 red row — oracle output dtype fixed this round,
# value-verified green locally; the green driver row closes it) + the
# 5 end-to-end CDC pipelines (re-gated every round) + the 38
# longest-stale entries (all 34 last gated in r4/r5 — dedup family,
# corpus sampling, multimodal, the stateful-streaming family,
# temporal rollups — and the 4 oldest r6 entries).  The r9 window (50
# green rows in CORRECTNESS_r09, sketch_join_size excepted) rotates
# out; everything outside the window stays certified by the per-round
# LOCALGATE artifact over the FULL registry + pytest.
_GATE_WINDOW = [
    # never driver-gated (6) — the round-10 queue + this round's addition
    "docs_tfidf_keywords",
    "events_resample_interp",
    "dq_latency_percentiles",
    "events_pivot_types",
    "layout_zonemap_scan",
    "cdc_variant_payload",
    # the r9 red row, re-gated after the oracle dtype fix (1)
    "sketch_join_size",
    # longest-stale: last gated r4/r5 (34)
    "events_props_extract",
    "profile_orders",
    "pii_redaction_report",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_graph_triangles",
    "corpus_decontaminate",
    "corpus_source_cap",
    "corpus_stratified_sample",
    "corpus_token_shards",
    "corpus_clean_pipeline",
    "sim_topk_query",
    "sim_knn_exact",
    "emb_int8_quantize",
    "mm_decode_meta",
    "mm_frame_sample",
    "mm_resize_roundtrip",
    "mm_features_similarity",
    "mm_audio_windows",
    "cdc_stateful_lww_stream",
    "cdc_stateful_lww_agg_stream",
    "cdc_windowed_ops_stream",
    "cdc_sessionize_stream",
    "events_stream_join",
    "cdc_first_seen_stream",
    "cdc_enrich_stream",
    "events_asof_attribution",
    "events_burst_windows",
    "events_hourly_rollup",
    "events_resample_ffill",
    # next-oldest: last gated r6 (4)
    "cdc_rollup_maintenance",
    "orders_running_windows",
    "order_priority_profile",
    "customer_activity_segments",
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

"""Query library: every entry in ``__spark_entry__.queries()`` lives here.

Each module exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL equivalents; omitted keys get
the driver's weaker rows-only check).

Registry ORDER matters: the external driver's correctness gate checks the
FIRST 50 queries in registry order. ``_GATE_WINDOW`` pins that window to the
50 highest-value targets — the full dedup/corpus/similarity/multimodal/
streaming/temporal extension suite (never driver-gated before round 5), the
two round-4 hash fixes, and the six end-to-end CDC pipelines — so every
operator family carries a driver-green correctness row. The remaining
analytics/text queries (all driver-green in r4 and stable since) follow,
then the round-5 additions (simjoin, incremental dedup, chunk/pack/
sample, ingest stream, ER fuzzy join, quantile sketch, snapshot diff)
— those carry LOCALGATE + pytest evidence this round and rotate into
the window next round.
"""

from __future__ import annotations

# Exactly 50 names: 42 queries with no r4 driver row (the LLM-pipeline
# extension suite + pii_redaction_report), the new corpus_source_cap,
# the 2 r4 hash-only failures (fixed in round 5, PARITY.md), and 5 of
# the 6 cdc pipelines.
# Round-6 rotation plan: once CORRECTNESS_r05 lands green rows for the
# window below, swap the r5-stable families out for the round-5-new
# queries (dedup_simjoin, dedup_incremental_exact/minhash,
# er_fuzzy_name_pairs, corpus_chunk_docs/pack_stream/weighted_sample,
# cdc_ingest_dedup_stream, sketch_price_quantiles,
# snapshot_partition_diff) so they earn driver rows too.
_GATE_WINDOW = [
    # dedup family (9)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_word_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_graph_triangles",
    "dedup_cluster_reps",
    # corpus family (7)
    "corpus_decontaminate",
    "corpus_source_cap",
    "corpus_repetition_stats",
    "corpus_stratified_sample",
    "corpus_token_shards",
    "corpus_clean_pipeline",
    "corpus_novelty",
    # similarity / ANN family (10)
    "sim_topk_query",
    "sim_knn_exact",
    "sim_lsh_topk",
    "sim_lsh_recall",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "sim_ivf_recall",
    "sim_pq_topk",
    "sim_pq_recall",
    "emb_int8_quantize",
    # multimodal family (5)
    "mm_decode_meta",
    "mm_frame_sample",
    "mm_resize_roundtrip",
    "mm_features_similarity",
    "mm_audio_windows",
    # streaming family (7)
    "cdc_stateful_lww_stream",
    "cdc_stateful_lww_agg_stream",
    "cdc_windowed_ops_stream",
    "cdc_sessionize_stream",
    "events_stream_join",
    "cdc_first_seen_stream",
    "cdc_enrich_stream",
    # temporal family (4)
    "events_asof_attribution",
    "events_burst_windows",
    "events_hourly_rollup",
    "events_resample_ffill",
    # text extension never gated (1)
    "pii_redaction_report",
    # round-4 hash-only failures, fixed round 5 (2)
    "events_props_extract",
    "profile_orders",
    # end-to-end CDC pipelines, re-gated every round (5; cdc_op_counts
    # — r3+r4 green, the simplest of the six — yields its slot to the
    # new corpus_source_cap operator)
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

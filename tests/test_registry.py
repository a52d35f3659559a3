"""Registry contract: the driver's correctness gate checks the FIRST 50
queries in registry order, so the window composition is load-bearing —
pin it so a refactor can't silently push an operator family out of the
driver's sight again (the round-4 failure mode)."""

from cdc_redshift_spark.queries import _GATE_WINDOW, all_queries


def test_gate_window_is_exactly_50_and_leads_registry():
    q, o = all_queries()
    names = list(q)
    assert len(_GATE_WINDOW) == 50
    assert names[:50] == _GATE_WINDOW
    assert len(names) == len(set(names))


def test_gate_window_is_the_round6_rotation():
    """The r6 window must hold every query that had no driver row after
    r5 — the round-5 operator layer (by family), the round-6 additions,
    the folded composites — plus the 5 CDC pipelines that are re-gated
    every round."""
    must_gate = {
        # round-5 operators, LOCALGATE-only before this rotation
        "dedup_simjoin", "dedup_incremental_exact",
        "dedup_incremental_minhash", "dedup_embedding_clusters",
        "er_fuzzy_name_pairs", "emb_contrastive_negatives",
        "corpus_chunk_docs", "corpus_pack_stream",
        "corpus_weighted_sample", "cdc_ingest_dedup_stream",
        "cdc_rollup_maintenance", "events_incremental_rollup",
        "snapshot_partition_diff", "orders_snapshot_changes",
        "events_user_sequences", "sketch_distinct_users",
        "sketch_hll_users", "sketch_price_quantiles",
        "dq_orders_suite", "dq_events_skew",
        # round-6 additions and folded composites
        "cdc_ingest_neardup_probe", "cdc_stream_schema_drift",
        "layout_pruned_scan", "customer_name_profile",
        "events_type_stats", "orders_running_windows", "cube_sales",
        "order_priority_profile", "customer_activity_segments",
        "text_stats", "corpus_doc_metrics",
        # CDC pipelines, every round
        "cdc_pg_replay", "cdc_lww_dedup", "cdc_dms_relational",
        "cdc_dms_schema_drift", "cdc_mongo_replay",
    }
    missing = must_gate - set(_GATE_WINDOW)
    assert not missing, f"never-driver-gated queries outside window: {missing}"
    # the 13 round-5 TPC-H plan shapes ride this rotation too
    tpch_new = {f"q{i}" for i in (2, 8, 9, 11, 12, 13, 15, 16, 17, 19, 20, 21, 22)}
    got = {n.split("_")[0] for n in _GATE_WINDOW if n[0] == "q" and n[1].isdigit()}
    assert tpch_new <= got, f"missing TPC-H rotations: {tpch_new - got}"


#: Queries allowed to omit a SQL oracle (driver falls back to the
#: rows-only check).  Each entry must name the pytest that value-gates
#: it instead; keep this list justified and short.
ROWS_ONLY_OK = {
    # DataSketches HLL estimate is implementation-defined (no DuckDB
    # equivalent); certified instead at REGISTER level — every
    # serialized register byte matches a pure-Python public-spec
    # mirror, union == elementwise max (tests/test_sketches.py +
    # tests/hll_register_mirror.py) — plus estimate-tolerance and
    # merge-equality gates.
    "sketch_hll_users",
}


def test_every_query_has_an_oracle_or_is_allowlisted():
    q, o = all_queries()
    missing = [n for n in q if n not in o and n not in ROWS_ONLY_OK]
    assert missing == [], missing
    stale = [n for n in ROWS_ONLY_OK if n not in q or n in o]
    assert stale == [], f"allowlist out of date: {stale}"


def test_no_cross_module_query_name_collisions():
    """Module QUERIES keys must be globally unique: the registry is a
    dict.update chain, so a duplicate name silently SHADOWS an earlier
    module's query (and its oracle) — exactly the failure that briefly
    replaced analytics' events_funnel with a temporal duplicate."""
    from collections import Counter

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

    names: list = []
    for mod in (
        cdc, analytics, text_q, dedup_q, corpus_q, similarity,
        multimodal_q, streaming_q, temporal_q, incremental_q, dq_q,
        layout_q, tpch_q,
    ):
        names += list(mod.QUERIES)
    dups = [n for n, c in Counter(names).items() if c > 1]
    assert not dups, f"query names shadow each other across modules: {dups}"

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


def test_gate_window_pins_the_round14_rotation():
    """The r14 window is a staleness refresh plus the entries that
    MUST gate this round: the new r14 queries, the queries whose
    semantics or maintainer code changed this round, and the 5 CDC
    pipelines re-gated every round.  (The bulk of the window — the
    r9/r10 staleness cohort — is policy, not correctness, so it is
    not pinned here; tools/rotate_window.py recomputes it.)"""
    must_gate = {
        # round-14 additions: the privacy triad's streaming faces
        "cdc_stream_k_anonymity",
        "cdc_stream_l_diversity",
        "cdc_stream_t_closeness",
        # code MODIFIED this round must re-gate: the emb-drift
        # left-join row-set fix (ADVICE r13), the shared k/l scorer
        # factoring, the snapshot store's _flip lost-pointer pruning
        # (ADVICE r13) -> store-backed entries, and the relaxed
        # long-key fixture assertion
        "emb_drift_report",
        "cdc_stream_emb_drift",
        "pii_k_anonymity",
        "pii_l_diversity",
        "pii_t_closeness",
        "cdc_scd2_history",
        "cdc_join_view_stream",
        "cdc_rollup_rebucket_stream",
        "cdc_rollup_autogrow_stream",
        "cdc_stream_psi_drift",
        "cdc_stream_token_drift",
        "sketch_hll_users",
        "plan_salted_exec",
        "dedup_simjoin",
        "dedup_containment",
        "sketch_user_overlap",
        "cdc_stream_kmv_rollup",
        "sketch_price_quantiles",
        "cdc_stream_cm_sketch",
        # CDC pipelines, every round
        "cdc_pg_replay", "cdc_lww_dedup", "cdc_dms_relational",
        "cdc_dms_schema_drift", "cdc_mongo_replay",
    }
    missing = must_gate - set(_GATE_WINDOW)
    assert not missing, f"never-driver-gated queries outside window: {missing}"


#: Queries allowed to omit a SQL oracle (driver falls back to the
#: rows-only check).  Each entry must name the pytest that value-gates
#: it instead; keep this list justified and short.
ROWS_ONLY_OK: set[str] = set()
# (empty since r11: sketch_hll_users — the last rows-only entry —
# now emits its HLL_8 registers as the query output, full-value
# hash-gated against a from-scratch SQL recomputation of the public
# spec (duck_hll8_registers); the implementation-defined lgk=12
# estimate is certified in-query by a raise-on-miss tolerance gate.)


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

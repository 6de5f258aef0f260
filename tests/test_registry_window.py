"""Registry-rotation guard: the external driver hard-checks the FIRST 50
registry entries in insertion order, so the window composition is
load-bearing — an accidental import-order change or a new registration
slipping in front of the priority list would silently rotate a query
out of (or into) the hard correctness gate. COVERAGE.md documents the
per-round rotation; this test pins it.
"""

from __future__ import annotations

from magshield_data_pipeline_spark.plans.registry import (
    _DRIVER_WINDOW_PRIORITY,
    QUERY_REGISTRY,
)

DRIVER_WINDOW = 50


def test_priority_list_is_the_window_prefix():
    names = list(QUERY_REGISTRY)
    assert names[: len(_DRIVER_WINDOW_PRIORITY)] == _DRIVER_WINDOW_PRIORITY


def test_window_covers_never_driver_checked_queries():
    # every query that had no driver CORRECTNESS row through round 3
    # must sit inside the round-4 window (VERDICT r3 task 1)
    never_checked = {
        "organisation_export_pipeline", "quote_export_pipeline",
        "task_export_pipeline", "opportunity_export_pipeline",
        "invoice_export_pipeline", "equipment_export_pipeline",
        "value_mad_per_type", "tfidf_top_terms", "document_chunks",
        "incremental_corpus_dedup", "source_mixture_sample", "event_funnel",
        "value_quantile_sketch", "embedding_quantized_recall",
        "corpus_cube_summary", "source_char_share",
        "incremental_near_dup_candidates", "merge_upsert_orders",
        "streaming_funnel_progress", "orders_column_profile",
        "orders_replica_diff", "orderkey_gap_islands",
        "scd2_user_state_history", "cohort_retention",
        "event_type_cooccurrence", "repeated_passages",
        "quota_stratified_sample", "cdc_chunk_table", "cdc_repeated_chunks",
        "weekly_event_deltas", "streaming_dedup_pairs",
        # last driver verdict was a FAILURE (r2) — must be re-proven
        "value_percentiles",
    }
    window = set(list(QUERY_REGISTRY)[:DRIVER_WINDOW])
    missing = never_checked - window
    assert not missing, f"unproven queries outside the driver window: {missing}"


def test_every_query_has_oracle_sql_or_is_documented_rows_only():
    rows_only = [n for n, s in QUERY_REGISTRY.items() if s.sql is None]
    # current registry is fully oracle-backed; additions must be
    # deliberate (the driver records a weaker rows-only check for them)
    assert rows_only == [], f"rows-only queries appeared: {rows_only}"

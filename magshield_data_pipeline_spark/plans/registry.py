"""Query registry: every operator from SURVEY §2 as a (Spark plan, DuckDB
oracle SQL) pair over the driver's test tables.

Each entry is the idiomatic-Spark restatement of one reference operator
pattern, expressed on the TPC-H-ish star schema (FIXTURES.md §A role
mapping: orders/lineitem = fact with fan-out; customer/supplier/nation/
region/part = broadcast dims; documents/embeddings/events = the [EXT]
scale-tier fixtures).

Conventions that keep the driver's order-insensitive value-hash stable:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are wrapped in ``round(..., 2..6)`` — the source money
  columns carry exactly 2 decimals, so real sums are exact multiples of
  0.01/0.0001 and rounding absorbs summation-order noise;
- timestamps that reach the output are formatted to strings;
- every top-k / limit has a total-order tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One oracle-checked query: Spark plan + equivalent DuckDB SQL.

    ``sql=None`` marks a genuinely non-SQL-expressible operator (custom
    stateful streaming, LSH pipelines); the driver then records a weaker
    rows-only check.
    """

    fn: QueryFn
    sql: Optional[str]
    description: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: Optional[str], description: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERY_REGISTRY[name] = QuerySpec(fn=fn, sql=sql, description=description)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in QUERY_REGISTRY.items() if spec.sql is not None
    }


# importing the plan modules populates the registry
from magshield_data_pipeline_spark.plans import reference_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import ext_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import nested_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import window_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import temporal_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import analytics_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import export_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import curation_queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window rotation.
#
# The external correctness driver checks the FIRST 50 registry entries in
# insertion order, so registration order IS the verification window.  Every
# query stays guarded by the local oracle-parity suite
# (tests/test_oracle_parity.py runs all of them against DuckDB at sf0.001);
# the explicit list below chooses which 50 get the driver's hard signal this
# round.  Rotation policy, auditable in COVERAGE.md:
#   1. queries with NO driver row in any round come first;
#   2. then queries whose last driver verdict is failing;
#   3. then oldest-last-green queries (every green verdict ages one round
#      per rotation — cycle them back before the evidence gets stale);
#   4. queries whose source was TOUCHED this round get re-checked even if
#      recently green;
#   5. the freshest-green remainder rotates out until the above are proven.
# tests/test_registry_window.py enforces invariants 1–2 mechanically from
# the CORRECTNESS_r*.json artifacts (ADVICE r4: the policy, not the list,
# is the contract).
#
# Round-6 window: the 24 r6-new queries (never-checked, tier 1 by
# policy), then the 10 r3-stale reference-core suites the r5 freshness
# test named (they re-enter after two rounds out), then the 5 queries
# whose source round 6 touched (semantic_dedup hot-cluster cap, linkage
# block guard, paged.py fallback restructure, stateful.py funnel
# k-buffer), then 11 of the 47 r4-greens — oldest evidence first, all
# six export pipelines and the streaming/temporal/multimodal pipelines
# kept. Rotated OUT (positions 51+): every r5-green (fresh by
# definition) plus 34 r4-greens chosen for lowest regression risk —
# profile/rollup/window/pair-join shapes with an in-window sibling
# (embedding_quantized_recall ~ embedding_pq_recall, rollup_summary ~
# mergeable_daily_rollup + corpus_cube_summary, value_mad/_quantile ~
# running_total_window + value_percentiles lineage, signup_click_burst
# ~ purchase_asof_click, event_type_cooccurrence ~ nation_pair_flows,
# top_ngrams ~ tfidf_top_terms, repetition/pii/orders_column profiles ~
# document_profile/orders_replica_diff, weekly_event_deltas /
# cohort_retention ~ running_total_window, approx_distinct_users ~
# engine-native HLL, sequence_packing / source_char_share / event_type_
# pivot ~ in-window salted-hash & CASE rollups, repeated_passages ~
# cdc_repeated_chunks + r5-green passage_dedup_reassembly,
# frame_sample_plan ~ r5-green media_resize_plan +
# multimodal_byte_profile, cdc_repeated_chunks ~ in-window
# cdc_chunk_table, source_mixture_sample ~ in-window
# quota_stratified_sample + r5-green weighted_sample_per_source,
# event_funnel ~ in-window streaming_funnel_progress over the same
# ordered-funnel semantics, kmeans_centroid_update ~ the in-window
# assign_clusters shape inside semantic_dedup_survivors,
# document_chunks ~ in-window cdc_chunk_table chunking,
# corpus_cube_summary ~ in-window mergeable_daily_rollup and the
# r4-proven grouping-set shapes, quota_stratified_sample ~ the
# in-window split/sample family + r5-green weighted draw,
# bucketed_colocated_join ~ its own exchange-free plan-shape test
# asserted every pytest run, incremental_near_dup_candidates ~
# in-window incremental_corpus_dedup + the r5-green LSH family,
# streaming_tumbling_counts ~ four in-window streaming siblings +
# the r5-green batch window trio, purchase_asof_click ~ three fresh
# in-window temporal-join siblings: orderdate_shipment_window,
# linear_attribution_credit, streaming_interval_join,
# streaming_dedup_pairs ~ the remaining in-window streaming trio +
# the r5-green dropDuplicatesWithinWatermark pytest, tfidf_top_terms
# ~ its own WindowGroupLimit plan-shape pytest asserted every run,
# multimodal_byte_profile ~ the metadata-plan pytests guarding the
# whole stub-codec multimodal family, contamination_check ~ the
# r5-green shingle/minhash family + in-window cdc_chunk_table,
# incremental_corpus_dedup ~ the r5-green exact-dedup + bloom
# anti-join shapes) — they
# become tier-1
# rotation priority for round 7 together with any r6 failure.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_PRIORITY: list[str] = [
    # -- tier 1: r6-new, never driver-checked
    "embedding_gram_matrix_blas",
    "embedding_pq_recall",
    "schema_drift_union",
    "salted_join_revenue",
    "pagerank_nations",
    "mergeable_daily_rollup",
    "dq_quarantine_rows",
    "orderdate_shipment_window",
    "half_life_decay_rollup",
    "group_holdout_split",
    "streaming_interval_join",
    "compaction_bin_plan",
    "part_min_cost_supplier",
    "nation_value_share",
    "sole_return_suppliers",
    "rolling_7day_revenue",
    "embedding_srp_multiprobe",
    "linear_attribution_credit",
    "embedding_topk_q20_blas",
    "embedding_srp_q20_candidates",
    "nation_triangle_graph",
    "order_price_histogram",
    "ppm_decode_stats",
    "ppm_resize_stats",
    # -- tier 3: last green r3 (two rounds stale) — reference core
    "conditional_counts",
    "date_format_suite",
    "string_function_suite",
    "running_total_window",
    "topk_per_group",
    "anti_join_orphans",
    "union_dedup",
    "count_probe",
    "nation_pair_flows",
    "json_props_extract",
    # -- tier 4: source touched in round 6 — re-prove under changed code
    "semantic_dedup_survivors",
    "entity_resolution_matches",
    "paged_source_scan",
    "streaming_funnel_progress",
    "stateful_sessionizer",
    # -- tier 5 fill: last green r4 (oldest remaining evidence) —
    #    export pipelines first (the reference-parity core)
    "organisation_export_pipeline",
    "quote_export_pipeline",
    "task_export_pipeline",
    "opportunity_export_pipeline",
    "invoice_export_pipeline",
    "equipment_export_pipeline",
    # -- tier 5 fill: r4 curation / dedup / ANN / text
    "training_data_pipeline",
    "cdc_chunk_table",
    # -- tier 5 fill: r4 streaming / temporal / multimodal / scale
    "scd2_user_state_history",
    "merge_upsert_orders",
    "orders_replica_diff",
    # -- tier 6 (positions 51+, outside the driver window): r5-greens
    #    and the 16 sibling-covered r4-greens; local parity suite
    #    remains their guard.
]

_missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in QUERY_REGISTRY]
if _missing:
    raise RuntimeError(f"driver-window priority names not registered: {_missing}")

QUERY_REGISTRY = {
    **{n: QUERY_REGISTRY[n] for n in _DRIVER_WINDOW_PRIORITY},
    **{n: s for n, s in QUERY_REGISTRY.items() if n not in _DRIVER_WINDOW_PRIORITY},
}

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
# Round-7 window: the 11 r7-new queries (never-checked, tier 1 by
# policy: the partition-pruning pair; the stdlib PNG, WAV and Y4M
# codecs + decoded-payload feature extractors that make every
# modality real; the JSONL + CSV corrupt-record ingests; the ORC
# round-trip; and the two-iteration exact Lloyd loop), then the
# 34 r4-greens the r6 freshness test named — they sat two rounds
# outside the window and are the mechanical tier-2 of this rotation
# (multimodal/sampling/text/streaming/temporal tiers re-proven), then
# the 5 queries whose source round 7 touched (embedding_srp_verified
# switched to the q20 integer-sign index with its oracle's candidate
# CTE switched in lockstep; embedding_topk_q20_blas under the new
# max_queries guard + generic id dtypes; ppm_decode_stats /
# ppm_resize_stats under the stricter magic-whitespace validation;
# schema_drift_union on the deterministic scratch layout) — 11 + 34
# + 5 = exactly 50, no fill tier this round.
# Rotated OUT (positions 51+): the 24 r6-greens (fresh by definition)
# and the remaining 37 r5-greens — every one an already-driver-proven
# query still guarded by the local all-query DuckDB parity suite; the
# r5-greens left outside become the mandatory tier for round 8
# (they hit the two-round staleness bound then), together with any r7
# failure. Unregistered this round (no longer in any window):
# embedding_gram_matrix and the float embedding_srp_candidates — each
# the slower of two hash-proven-equivalent plans, demoted to pytest
# equivalence controls per VERDICT r6 (#2/#4).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_PRIORITY: list[str] = [
    # -- tier 1: r7-new, never driver-checked
    "partition_pruned_scan",
    "dpp_top_month_revenue",
    "png_decode_stats",
    "jsonl_ingest_rollup",
    "orc_roundtrip_scan",
    "kmeans_lloyd_two_steps",
    "csv_ingest_rollup",
    "wav_decode_stats",
    "y4m_frame_stats",
    "wav_energy_windows",
    "y4m_motion_stats",
    # -- tier 2: last green r4 (two rounds stale) — the r6 freshness
    #    test's list, re-entering per policy
    "approx_distinct_users",
    "bucketed_colocated_join",
    "cdc_repeated_chunks",
    "cohort_retention",
    "contamination_check",
    "corpus_cube_summary",
    "document_chunks",
    "embedding_quantized_recall",
    "event_funnel",
    "event_type_cooccurrence",
    "event_type_pivot",
    "frame_sample_plan",
    "incremental_corpus_dedup",
    "incremental_near_dup_candidates",
    "kmeans_centroid_update",
    "multimodal_byte_profile",
    "orders_column_profile",
    "pii_redaction_profile",
    "purchase_asof_click",
    "quota_stratified_sample",
    "repeated_passages",
    "repetition_profile",
    "rollup_summary",
    "sequence_packing",
    "signup_click_burst",
    "source_char_share",
    "source_mixture_sample",
    "streaming_dedup_pairs",
    "streaming_tumbling_counts",
    "tfidf_top_terms",
    "top_ngrams",
    "value_mad_per_type",
    "value_quantile_sketch",
    "weekly_event_deltas",
    # -- tier 4: source touched in round 7 — re-prove under changed code
    "embedding_srp_verified",
    "embedding_topk_q20_blas",
    "ppm_decode_stats",
    "ppm_resize_stats",
    "schema_drift_union",
    # -- (no tier-5 fill this round: the 11 r7-new queries consumed
    #    every remaining slot; the displaced r5-green fills —
    #    multi_hop_revenue, quote_enrichment, users_projection_dedup,
    #    semi_join_pushdown, three_role_nation_join, mail_scan_topn,
    #    order_part_fanout, links_array_pipeline — join the r8
    #    mandatory tier, their shapes covered in-window by the export
    #    pipelines and the lookback scan; multi_hop_revenue also runs
    #    every round as the entry() smoke)
    # -- tier 6 (positions 51+, outside the driver window): r6-greens
    #    and the remaining r5-greens; local parity suite remains their
    #    guard, and the r5-greens are round 8's mandatory tier.
]

_missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in QUERY_REGISTRY]
if _missing:
    raise RuntimeError(f"driver-window priority names not registered: {_missing}")

QUERY_REGISTRY = {
    **{n: QUERY_REGISTRY[n] for n in _DRIVER_WINDOW_PRIORITY},
    **{n: s for n, s in QUERY_REGISTRY.items() if n not in _DRIVER_WINDOW_PRIORITY},
}

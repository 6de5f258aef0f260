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
# Round-5 window: the 4 r4-late additions that have never seen the driver
# + the 15 r5-new queries (all never-checked, tier 1 by policy), then 28
# of the 38 queries whose last green is r3, then 2 fill slots for
# code-touched r4 queries. Rotated OUT (positions 51+): 43 queries green
# in r4, plus 10 r3-green suites displaced by the r5-new tier-1 and
# tier-4 entries
# (`date_format_suite`, `string_function_suite`, `json_props_extract`,
# `count_probe`, `union_dedup`, `topk_per_group`, `anti_join_orphans`,
# `conditional_counts`, `nation_pair_flows`, `running_total_window` —
# chosen for lowest
# regression risk: pure projection/metadata/set-op/ranking/CASE-count/
# pair-join shapes whose patterns stay covered in-window by sibling
# queries (mail_scan_topn, windowed_top_events, quota/weighted draws,
# data_quality_gate's FK anti-join and CASE rules, three_role_nation_
# join's aliased-dim pair joins) plus dedicated pytest; they become
# tier-1 rotation priority for round 6 together with any r5 failure,
# see COVERAGE.md).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_PRIORITY: list[str] = [
    # -- tier 1: never driver-checked (r4 additions + the new r5 query)
    "embedding_srp_candidates",
    "near_dup_clusters_star",
    "sharded_hll_union",
    "media_resize_plan",
    "embedding_srp_verified",
    # -- tier 1: r5 additions, second batch (sketch / sampling /
    #    linear-algebra / semantic-dedup tier)
    "cms_heavy_hitters",
    "weighted_sample_per_source",
    "semantic_dedup_survivors",
    "embedding_gram_matrix",
    "embedding_pq_topk",
    "kmv_segment_overlap",
    "data_quality_gate",
    "entity_resolution_matches",
    "hilbert_layout_stats",
    # -- tier 3: last green r3 — the reference core set
    "users_projection_dedup",
    "quote_enrichment",
    "order_part_fanout",
    "last_wins_fold",
    "mail_scan_topn",
    "multi_hop_revenue",
    "pricing_summary",
    "semi_join_pushdown",
    "three_role_nation_join",
    "links_array_pipeline",
    "custom_fields_last_wins",
    "link_type_dispatch",
    # -- tier 3: last green r3 — curation / dedup / ANN set
    "document_profile",
    "exact_dedup_documents",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_hamming_pairs",
    "embedding_topk_cosine",
    "embedding_cosine_dup_pairs",
    "embedding_ivf_topk",
    "train_test_split",
    "near_dup_clusters",
    "curriculum_quality_buckets",
    # -- tier 3: last green r3 — streaming / window set
    "tumbling_window_rollup",
    "sliding_window_activity",
    "session_window_rollup",
    "distinct_users_per_type",
    # -- tier 4: code touched in round 5 (paged.py Arrow fallback,
    #    dedup.py min-struct/docstring, unpersist wrappers, the
    #    bucketed sequence_gaps rewrite) or green in only one round —
    #    re-prove under the changed code
    "paged_source_scan",
    "value_percentiles",
    "orderkey_gap_islands",
    # -- tier 1 again: the r5-new queries (never checked outranks green,
    #    so they displaced the greenest fill slots)
    "zorder_layout_stats",
    "bloom_prefiltered_dedup",
    "passage_dedup_reassembly",
    "key_skew_profile",
    "windowed_top_events",
    # -- tier 5 (positions 51+, outside the driver window): green in r4;
    #    local parity suite remains their guard.
]

_missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in QUERY_REGISTRY]
if _missing:
    raise RuntimeError(f"driver-window priority names not registered: {_missing}")

QUERY_REGISTRY = {
    **{n: QUERY_REGISTRY[n] for n in _DRIVER_WINDOW_PRIORITY},
    **{n: s for n, s in QUERY_REGISTRY.items() if n not in _DRIVER_WINDOW_PRIORITY},
}

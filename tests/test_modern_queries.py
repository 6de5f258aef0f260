"""Spark-4 surface tier (plans/modern_queries.py): oracle parity for the
pending specs, the capacity-aware admission rule, and the plan shapes
that make each query 100 TB-viable (variant parse-once, shuffle-free
unpivot, decorrelated lateral top-n)."""

from __future__ import annotations

import pytest

from magshield_data_pipeline_spark.plans import modern_queries as M
from magshield_data_pipeline_spark.plans import oracle_harness
from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from tests.conftest import SF_SMALL

PENDING = sorted(M.PENDING_SPECS)


def _physical_plan(df) -> str:
    return (
        df.sparkSession._jsparkSession.sessionState()
        .executePlan(
            df._jdf.queryExecution().logical(),
            df._jdf.queryExecution().mode(),
        )
        .executedPlan()
        .toString()
    )


def _shuffles(plan: str) -> int:
    return plan.replace("BroadcastExchange", "").count("Exchange")


# ---------------------------------------------------------------------------
# oracle parity — same driver-faithful comparator as the registered
# suite, so evidence does not wait on window admission


@pytest.mark.parametrize("name", PENDING)
def test_pending_matches_oracle(spark, name):
    spec = M.PENDING_SPECS[name]
    res = oracle_harness.compare_query(spark, name, spec.fn, spec.sql, SF_SMALL)
    assert res["ok"], res


# ---------------------------------------------------------------------------
# admission mechanics


def test_admission_rule_is_pure_and_bounded():
    assert not M.is_admitted(M._ADMIT_AFTER_ROUND - 1)
    assert M.is_admitted(M._ADMIT_AFTER_ROUND)
    assert M.is_admitted(M._ADMIT_AFTER_ROUND + 5)


def test_registry_state_consistent_with_admission():
    # either every pending spec is registered (admitted) or none is —
    # a half-admitted state would make bench/driver coverage ambiguous
    registered = [n for n in PENDING if n in QUERY_REGISTRY]
    if M.ADMITTED:
        assert registered == PENDING
    else:
        assert registered == []


def test_admission_flips_exactly_at_artifact_round():
    # the artifact scan and the rule compose the way the module
    # docstring promises: admitted iff the driver has written the
    # artifact for _ADMIT_AFTER_ROUND
    assert M.ADMITTED == (M.max_artifact_round() >= M._ADMIT_AFTER_ROUND)


# ---------------------------------------------------------------------------
# plan shapes


def test_variant_rollup_plan(spark):
    df = M.PENDING_SPECS["variant_events_rollup"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    # typed path extraction stays engine-side: no Python evaluation
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "variant_get" in plan.lower()
    # one partial-aggregated groupBy: exactly one shuffle
    assert _shuffles(plan) == 1, plan


def test_unpivot_adds_no_exchange(spark):
    df = M.PENDING_SPECS["event_value_unpivot"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    # the aggregate's shuffle is the ONLY one; the wide→long Expand
    # rides on top of the grouped result
    assert "Expand" in plan, plan
    assert _shuffles(plan) == 1, plan


def test_lateral_decorrelates_to_rank_limit(spark):
    df = M.PENDING_SPECS["customer_top_orders_lateral"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    # the correlated LIMIT 2 must become a rank-limit pipeline with a
    # map-side partial pass, not a per-parent nested loop
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert _shuffles(plan) == 1, plan
    # customer filter reaches the scan
    assert "LessThan(c_nationkey,5)" in plan, plan


# ---------------------------------------------------------------------------
# inner-lateral semantics: parents with no children drop out (matches
# the oracle's CROSS JOIN LATERAL), and no parent exceeds the limit


def test_lateral_per_parent_limit(spark):
    df = M.PENDING_SPECS["customer_top_orders_lateral"].fn(spark, SF_SMALL)
    from pyspark.sql import functions as F

    per_parent = df.groupBy("c_custkey").count()
    mx = per_parent.agg(F.max("count").alias("m")).collect()[0]["m"]
    assert mx <= 2


# ---------------------------------------------------------------------------
# Observation metrics: piggyback on the consuming action, no second scan


def test_observe_metrics_rides_the_single_action(spark):
    import duckdb
    from pyspark.sql import functions as F

    from magshield_data_pipeline_spark.operators.quality import observe_metrics
    from magshield_data_pipeline_spark.sources.parquet import read_table

    events = read_table(spark, SF_SMALL, "events")
    observed, obs = observe_metrics(
        events,
        "ingest_metrics",
        {
            "rows_seen": F.count(F.lit(1)),
            "null_props": F.count(F.lit(1)) - F.count("props"),
            # DISTINCT aggregates are rejected in observed metrics
            # (INVALID_OBSERVED_METRICS); the HLL sketch is the
            # observable form — exact at this cardinality
            "distinct_types": F.approx_count_distinct("event_type"),
        },
    )
    # ONE action on a downstream aggregate; the metrics must ride it
    rollup = observed.groupBy("event_type").agg(F.count("*").alias("n"))
    n_groups = rollup.count()
    got = obs.get

    truth = duckdb.sql(
        f"""
        SELECT CAST(count(*) AS BIGINT) rows_seen,
               CAST(count(*) - count(props) AS BIGINT) null_props,
               CAST(count(DISTINCT event_type) AS BIGINT) distinct_types
        FROM read_parquet('{SF_SMALL}/events.parquet')
        """
    ).fetchone()
    assert (got["rows_seen"], got["null_props"], got["distinct_types"]) == truth
    assert n_groups == truth[2]


# ---------------------------------------------------------------------------
# r8 rehearsal: when the r7 artifact lands, the pending tier admits and
# the recomputed window still satisfies every invariant — round 8 must
# start green, not with a capacity overflow


def test_r8_window_admits_pending_within_capacity(monkeypatch):
    from magshield_data_pipeline_spark.plans import registry as R

    base_hist = R.driver_history()
    window_now = list(QUERY_REGISTRY)[:50]

    def simulated_hist():
        hist = {n: dict(rounds) for n, rounds in base_hist.items()}
        for n in window_now:  # driver proves the whole r7 window green
            hist.setdefault(n, {})[7] = True
        return hist

    monkeypatch.setattr(R, "driver_history", simulated_hist)
    registry_r8 = {**QUERY_REGISTRY, **M.PENDING_SPECS}
    window = R._compute_driver_window(registry_r8, R._WINDOW_PINS, size=50)
    assert len(window) == 50

    hist = simulated_hist()
    # tier 3: every never-checked query (the admitted pending specs)
    # must be inside
    for n in PENDING:
        assert n in window, f"pending query {n} missed the r8 window"
    # no last-failing or never-checked query outside
    for n in registry_r8:
        rounds = hist.get(n)
        if not rounds or not rounds[max(rounds)]:
            assert n in window, f"unproven {n} outside simulated r8 window"
    # all r7 pins expired (proven green in round 7) — no pin holds a slot
    active_pins = [
        n
        for n, pr in R._WINDOW_PINS
        if n in registry_r8
        and max((r for r, g in hist.get(n, {}).items() if g), default=0) < pr
    ]
    assert active_pins == [], f"pins survived the r7 artifact: {active_pins}"

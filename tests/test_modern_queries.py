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
# admission outcome: once the r7 artifact exists the pending tier is LIVE
# (per ADVICE r7 the pre-artifact rehearsal was self-falsifying exactly
# when the rehearsed event occurred — once the driver stamps the r7
# window green, simulating "r7 all green" marks the now-admitted pending
# specs themselves green and ejects them from tier 3).  The simulation is
# gone; this asserts the real thing instead: every never-driver-checked
# admitted spec occupies a live window slot, within capacity.


def test_admitted_pending_specs_hold_live_window_slots():
    if not M.ADMITTED:
        pytest.skip("r7 artifact not yet written — admission not live")
    from magshield_data_pipeline_spark.plans import registry as R

    hist = R.driver_history()
    window = list(QUERY_REGISTRY)[: len(R._DRIVER_WINDOW_PRIORITY)]
    assert len(window) == 50
    for n in PENDING:
        assert n in QUERY_REGISTRY, f"admitted spec {n} not registered"
        if n not in hist:  # never driver-checked → tier 3 → in-window
            assert n in window, f"never-checked admitted spec {n} outside window"


# ---------------------------------------------------------------------------
# r8: UDTF chunker contract (overlap semantics the oracle can't isolate)


def test_windowed_chunks_overlap_and_final_partial():
    from magshield_data_pipeline_spark.operators.udtfs import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        WindowedChunks,
    )

    words = [f"w{i}" for i in range(45)]  # 45 words: windows at 0, 20, 40
    rows = list(WindowedChunks().eval(" ".join(words)))
    assert [r[0] for r in rows] == [0, 1, 2]
    assert [r[1] for r in rows] == [30, 25, 5]  # final window is partial
    w0, w1 = rows[0][2].split(), rows[1][2].split()
    # consecutive windows overlap by size - stride words
    assert w0[CHUNK_STRIDE:] == w1[: CHUNK_SIZE - CHUNK_STRIDE]
    assert list(WindowedChunks().eval(None)) == []
    assert list(WindowedChunks().eval("")) == []

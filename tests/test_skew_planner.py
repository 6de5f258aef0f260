"""NDV-driven skew planning (plans/modern_queries.py:
snapshot_skew_planner + operators/scale.py:salted_sum_count).

The decision — salted two-stage aggregate vs plain groupBy — comes
from MANIFEST metadata alone (table_rows / approx_ndv); these tests
pin the decision boundary on planted skew/uniform ledger tables and
the PLAN SHAPE of both routes (the salt stage exists exactly when the
metadata says it should).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators.scale import salted_sum_count
from magshield_data_pipeline_spark.sources import snapshots as S


def _tables(spark, tmp_path):
    skew = os.path.join(str(tmp_path), "skew")
    uni = os.path.join(str(tmp_path), "uni")
    rows = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
        .cast("long").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    S.overwrite(rows, skew, n_files=4, ndv_for=["k"])
    S.overwrite(
        spark.range(1000).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("v")),
        uni, n_files=4, ndv_for=["k"],
    )
    return skew, uni


def test_metadata_decision_matches_planted_skew(spark, tmp_path):
    skew, uni = _tables(spark, tmp_path)
    r_skew = S.table_rows(skew) / S.approx_ndv(skew, "k")
    r_uni = S.table_rows(uni) / S.approx_ndv(uni, "k")
    # 90% hot key -> ratio ~ 10; uniform -> ~1 (HLL err ~6.5%)
    assert r_skew > 5.0, r_skew
    assert r_uni < 5.0, r_uni


def test_salted_route_has_salt_stage_plain_does_not(spark, tmp_path):
    skew, uni = _tables(spark, tmp_path)
    salted_plan = salted_sum_count(
        S.read(spark, skew), "k", "v"
    )._jdf.queryExecution().executedPlan().toString()
    plain_plan = (
        S.read(spark, uni)
        .groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n_rows"))
    )._jdf.queryExecution().executedPlan().toString()
    # the two-stage pre-agg is planned: partial sums keyed by the
    # xxhash64 salt ("_psum" partials exist only on the salted route;
    # don't grep "_salt" itself — pytest tmp dirs contain it)
    assert "_psum" in salted_plan and "xxhash64" in salted_plan
    assert "_psum" not in plain_plan and "xxhash64" not in plain_plan


def test_both_routes_compute_identical_aggregates(spark, tmp_path):
    skew, _ = _tables(spark, tmp_path)
    df = S.read(spark, skew)
    a = salted_sum_count(df, "k", "v").orderBy("k").collect()
    b = (
        df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

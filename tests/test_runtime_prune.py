"""Runtime join-driven file pruning (snapshots.read_join_pruned, r12):
dim-side cardinality picks point-lookup vs range pruning, the report
hook pins that pruning occurred, and soundness is exact (pruned scan
joins identically to a full scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _fact(spark, n=1000):
    return spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


@pytest.fixture()
def clustered(spark, tmp_path):
    t = str(tmp_path / "fact")
    S.overwrite(_fact(spark), t, n_files=2)
    S.compact(spark, t, n_files=8, cluster_by=["k"])
    return t


def test_point_lookup_prunes_and_is_exact(spark, clustered):
    dim = spark.createDataFrame([(3,), (501,)], "dk long")
    rep: dict = {}
    df = S.read_join_pruned(spark, clustered, dim, key="k",
                            dim_key="dk", report=rep)
    assert rep["strategy"] == "point-lookup"
    assert rep["n_probes"] == 2
    assert rep["files_scanned"] <= 2 < rep["files_total"]
    got = sorted((r.k, r.v) for r in
                 df.join(dim, df["k"] == dim["dk"]).select("k", "v")
                 .collect())
    assert got == [(3, 9), (501, 1503)]


def test_range_strategy_when_dim_exceeds_max_probes(spark, clustered):
    dim = spark.range(100, 220).select(F.col("id").alias("k"))
    rep: dict = {}
    df = S.read_join_pruned(spark, clustered, dim, key="k",
                            max_probes=50, report=rep)
    assert rep["strategy"] == "range"
    assert rep["files_scanned"] < rep["files_total"]
    got = df.join(dim, ["k"]).count()
    assert got == 120


def test_empty_dim_returns_empty_without_scanning(spark, clustered):
    dim = spark.range(0).select(F.col("id").alias("k"))
    rep: dict = {}
    df = S.read_join_pruned(spark, clustered, dim, key="k", report=rep)
    assert rep["strategy"] == "empty-dim"
    assert rep["files_scanned"] == 0
    assert df.count() == 0
    assert df.columns == ["k", "v"]


def test_pruned_join_equals_full_scan_join(spark, clustered):
    dim = spark.createDataFrame([(17,), (864,), (999,)], "k long")
    pruned = S.read_join_pruned(spark, clustered, dim, key="k")
    full = S.read(spark, clustered)
    a = sorted(tuple(r) for r in pruned.join(dim, ["k"]).collect())
    b = sorted(tuple(r) for r in full.join(dim, ["k"]).collect())
    assert a == b and len(a) == 3


def test_prune_respects_pending_deletes(spark, clustered):
    # a pruned read over a table with pending MOR deletes still
    # reconciles them (read() owns the delete application)
    S.delete(spark.createDataFrame([(3,)], "k long"), clustered,
             key="k", mode="merge-on-read")
    dim = spark.createDataFrame([(3,), (4,)], "k long")
    df = S.read_join_pruned(spark, clustered, dim, key="k")
    got = sorted(r.k for r in df.join(dim, ["k"]).collect())
    assert got == [4]

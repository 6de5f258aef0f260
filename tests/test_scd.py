"""Incremental SCD2 maintenance (operators/scd.py): per-key interval
algebra over the row-CDC feed, single-commit atomicity, replay
idempotence, empty-window silence, surrogate packing guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import scd
from magshield_data_pipeline_spark.sources import snapshots as S


def _rows(spark, *pairs):
    return spark.createDataFrame(list(pairs), "k long, v string")


def _hist(spark, mirror):
    return sorted(
        (r.k, r.valid_from, r.valid_to, r.v)
        for r in S.read(spark, mirror).collect()
    )


def test_scd2_full_lifecycle(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    mir = os.path.join(str(tmp_path), "mir")
    S.overwrite(_rows(spark, (1, "a"), (2, "b"), (3, "c")), src, n_files=1)
    S.merge(_rows(spark, (2, "b2"), (4, "d")), src, key="k")      # v2
    S.delete(spark.createDataFrame([(3,)], "k long"), src, key="k")  # v3
    S.compact(spark, src, n_files=1)                               # v4

    scd.init_scd2(spark, src, mir, "k", ["v"], version=1)
    for v in (2, 3, 4):
        scd.refresh_scd2(spark, src, mir, "k", ["v"], v - 1, v)
    assert _hist(spark, mir) == [
        (1, 1, None, "a"),
        (2, 1, 2, "b"), (2, 2, None, "b2"),
        (3, 1, 3, "c"),
        (4, 2, None, "d"),
    ]
    # compact window committed nothing: init(2 versions) + 2 merges
    assert len(S.versions(mir)) == 4


def test_scd2_multi_commit_window_collapses(spark, tmp_path):
    # update -> update -> delete of ONE key inside a single refresh
    # window must chain intervals without per-commit loops
    src = os.path.join(str(tmp_path), "src")
    mir = os.path.join(str(tmp_path), "mir")
    S.overwrite(_rows(spark, (7, "x")), src, n_files=1)            # v1
    scd.init_scd2(spark, src, mir, "k", ["v"], version=1)
    S.merge(_rows(spark, (7, "y")), src, key="k")                  # v2
    S.merge(_rows(spark, (7, "z")), src, key="k")                  # v3
    S.delete(spark.createDataFrame([(7,)], "k long"), src, key="k")  # v4
    scd.refresh_scd2(spark, src, mir, "k", ["v"], 1, 4)
    assert _hist(spark, mir) == [
        (7, 1, 2, "x"), (7, 2, 3, "y"), (7, 3, 4, "z"),
    ]


def test_scd2_delete_then_reinsert(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    mir = os.path.join(str(tmp_path), "mir")
    S.overwrite(_rows(spark, (5, "old")), src, n_files=1)          # v1
    scd.init_scd2(spark, src, mir, "k", ["v"], version=1)
    S.delete(spark.createDataFrame([(5,)], "k long"), src, key="k")  # v2
    S.merge(_rows(spark, (5, "new")), src, key="k")                # v3
    scd.refresh_scd2(spark, src, mir, "k", ["v"], 1, 3)
    assert _hist(spark, mir) == [(5, 1, 2, "old"), (5, 3, None, "new")]


def test_scd2_replay_and_empty_window_are_noops(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    mir = os.path.join(str(tmp_path), "mir")
    S.overwrite(_rows(spark, (1, "a")), src, n_files=1)
    scd.init_scd2(spark, src, mir, "k", ["v"], version=1)
    S.merge(_rows(spark, (1, "a2")), src, key="k")                 # v2
    assert scd.refresh_scd2(spark, src, mir, "k", ["v"], 1, 2) is not None
    before = _hist(spark, mir)
    n_before = len(S.versions(mir))
    # replayed window: app txn watermark already covers to_version=2
    assert scd.refresh_scd2(spark, src, mir, "k", ["v"], 1, 2) is None
    # empty window: a compact commit emits zero row changes
    S.compact(spark, src, n_files=1)                               # v3
    assert scd.refresh_scd2(spark, src, mir, "k", ["v"], 2, 3) is None
    assert _hist(spark, mir) == before
    assert len(S.versions(mir)) == n_before


def test_scd2_surrogate_overflow_fails_loudly(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    mir = os.path.join(str(tmp_path), "mir")
    S.overwrite(_rows(spark, (1, "a")), src, n_files=1)
    scd.init_scd2(spark, src, mir, "k", ["v"], version=1)
    S.merge(
        spark.createDataFrame([(2**62, "big")], "k long, v string"),
        src, key="k",
    )
    with pytest.raises(ValueError, match="surrogate"):
        scd.refresh_scd2(spark, src, mir, "k", ["v"], 1, 2)

"""Snapshot-versioned table core: versioned manifests, time travel,
append/overwrite/compact, snapshot isolation, optimistic commit, and
manifest-level file pruning (sources/snapshots.py)."""

from __future__ import annotations

import json
import os

import pytest

from magshield_data_pipeline_spark.sources import snapshots as S


def _tbl(tmp_path, name):
    return str(tmp_path / name)


def test_append_overwrite_compact_version_chain(spark, tmp_path):
    t = _tbl(tmp_path, "t1")
    df1 = spark.range(0, 10).withColumnRenamed("id", "k")
    df2 = spark.range(10, 15).withColumnRenamed("id", "k")
    v1 = S.overwrite(df1, t, n_files=2)
    v2 = S.append(df2, t, n_files=2)
    v3 = S.compact(spark, t, n_files=1)
    assert (v1, v2, v3) == (1, 2, 3)
    assert S.versions(t) == [1, 2, 3]
    assert sorted(r.k for r in S.read(spark, t, 1).collect()) == list(range(10))
    assert sorted(r.k for r in S.read(spark, t, 2).collect()) == list(range(15))
    # compact is logically a no-op...
    assert sorted(r.k for r in S.read(spark, t).collect()) == list(range(15))
    # ...but physically shrinks the file list 4 -> 1
    assert len(S.read_manifest(t, 2)["files"]) == 4
    assert len(S.read_manifest(t, 3)["files"]) == 1


def test_snapshot_isolation_old_versions_survive_overwrite(spark, tmp_path):
    t = _tbl(tmp_path, "t2")
    S.overwrite(spark.range(0, 5).withColumnRenamed("id", "k"), t)
    old = S.read(spark, t, 1)  # reader pinned to v1
    S.overwrite(spark.range(100, 103).withColumnRenamed("id", "k"), t)
    # the later overwrite never deletes v1's files: the pinned reader
    # still sees exactly v1's rows AFTER the commit
    assert sorted(r.k for r in old.collect()) == [0, 1, 2, 3, 4]
    assert sorted(r.k for r in S.read(spark, t).collect()) == [100, 101, 102]


def test_manifest_publish_is_exclusive_and_composes(spark, tmp_path):
    # simulate a racing writer: pre-create the version the next commit
    # would take; the commit must NOT clobber it (os.link is exclusive),
    # must land on the following number, AND must carry the racer's
    # files forward (append-append conflicts compose, never lost-update)
    t = _tbl(tmp_path, "t3")
    S.overwrite(spark.range(3).withColumnRenamed("id", "k"), t)
    race = os.path.join(t, "_manifests", "v2.json")
    sentinel = {"path": "data/raced/part-sentinel.parquet", "rows": 0,
                "stats": {}}
    with open(race, "w") as f:
        json.dump({"version": 2, "operation": "race", "files":
                   S.read_manifest(t, 1)["files"] + [sentinel]}, f)
    v = S.append(spark.range(3, 5).withColumnRenamed("id", "k"), t)
    assert v == 3  # the loser retried past the raced version
    assert json.load(open(race))["operation"] == "race"  # untouched
    # v3's carry was re-resolved against v2, so the racer's file stays
    assert sentinel["path"] in {
        e["path"] for e in S.read_manifest(t, 3)["files"]
    }


def test_file_pruning_skips_disjoint_ranges(spark, tmp_path):
    t = _tbl(tmp_path, "t4")
    S.overwrite(spark.range(0, 100).withColumnRenamed("id", "k"), t,
                n_files=1)
    S.append(spark.range(1000, 1100).withColumnRenamed("id", "k"), t,
             n_files=1)
    full = S.read(spark, t)
    pruned = S.read(spark, t, prune=("k", 0.0, 50.0))
    # manifest stats prune the high-range file BEFORE Spark plans
    assert len(full.inputFiles()) == 2
    assert len(pruned.inputFiles()) == 1
    assert pruned.count() == 100  # pruning shrinks files, not rows...
    assert pruned.filter("k <= 50").count() == 51  # ...the filter does


def test_read_rejects_unknown_and_empty(spark, tmp_path):
    t = _tbl(tmp_path, "t5")
    with pytest.raises(ValueError, match="no versions"):
        S.read(spark, t)
    S.overwrite(spark.range(5).withColumnRenamed("id", "k"), t, n_files=1)
    with pytest.raises(ValueError, match="not in"):
        S.read(spark, t, 7)
    with pytest.raises(ValueError, match="after pruning"):
        S.read(spark, t, prune=("k", 1e9, 2e9))


def test_read_changes_is_the_file_diff(spark, tmp_path):
    t = _tbl(tmp_path, "t6")
    S.overwrite(spark.range(0, 10).withColumnRenamed("id", "k"), t)
    S.append(spark.range(10, 14).withColumnRenamed("id", "k"), t)
    S.append(spark.range(14, 15).withColumnRenamed("id", "k"), t)
    # v1 -> v2: exactly the appended rows; cost = the change, not the table
    assert sorted(r.k for r in S.read_changes(spark, t, 1, 2).collect()) \
        == list(range(10, 14))
    assert sorted(r.k for r in S.read_changes(spark, t, 1, 3).collect()) \
        == list(range(10, 15))
    with pytest.raises(ValueError, match="need from < to"):
        S.read_changes(spark, t, 2, 2)


def test_vacuum_reclaims_only_unreferenced_files(spark, tmp_path):
    t = _tbl(tmp_path, "t7")
    S.overwrite(spark.range(0, 6).withColumnRenamed("id", "k"), t, n_files=2)
    S.append(spark.range(6, 9).withColumnRenamed("id", "k"), t, n_files=1)
    S.compact(spark, t, n_files=1)  # v3 re-lists nothing from v1/v2
    deleted = S.vacuum(t, keep_versions=1)
    assert len(deleted) == 3  # v1's 2 files + v2's 1, none shared with v3
    assert S.versions(t) == [3]
    # the retained snapshot is fully readable after the reclaim
    assert sorted(r.k for r in S.read(spark, t).collect()) == list(range(9))
    # a vacuumed version fails loudly on its missing manifest
    with pytest.raises(ValueError, match="not in"):
        S.read(spark, t, 1)


def test_vacuum_keeps_files_shared_with_retained_versions(spark, tmp_path):
    t = _tbl(tmp_path, "t8")
    S.overwrite(spark.range(0, 4).withColumnRenamed("id", "k"), t, n_files=1)
    S.append(spark.range(4, 6).withColumnRenamed("id", "k"), t, n_files=1)
    # v2 carries v1's file forward: dropping v1 must DELETE NOTHING
    assert S.vacuum(t, keep_versions=1) == []
    assert sorted(r.k for r in S.read(spark, t).collect()) == list(range(6))


def test_stream_batch_commit_is_exactly_once(spark, tmp_path):
    t = _tbl(tmp_path, "t9")
    b0 = spark.range(0, 4).withColumnRenamed("id", "k")
    b1 = spark.range(4, 6).withColumnRenamed("id", "k")
    assert S.append_stream_batch(b0, t, batch_id=0) == 1
    assert S.append_stream_batch(b1, t, batch_id=1) == 2
    # epoch REPLAY (failure re-run with the same batch_id): no-op,
    # no new version, table content unchanged
    assert S.append_stream_batch(b0, t, batch_id=0) is None
    assert S.versions(t) == [1, 2]
    assert sorted(r.k for r in S.read(spark, t).collect()) == list(range(6))
    # the ledger records which epoch produced each version
    assert S.read_manifest(t, 2)["batch_id"] == 1


def test_commit_survives_empty_part_files(spark, tmp_path):
    # 1 row split into 2 files leaves one part file EMPTY: the single
    # grouped stats job sees no row for it, and the manifest must
    # record it as rows=0 instead of crashing — reads stay correct
    t = _tbl(tmp_path, "t10")
    S.overwrite(spark.range(0, 1).withColumnRenamed("id", "k"), t,
                n_files=2)
    m = S.read_manifest(t, 1)
    assert sorted(e["rows"] for e in m["files"]) == [0, 1]
    assert [r.k for r in S.read(spark, t).collect()] == [0]

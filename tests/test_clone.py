"""Shallow clone (sources/snapshots.py:clone_table): the Delta CLONE
contract — a new ledger referencing the source snapshot zero-copy.

Pins: one metadata commit, zero data bytes moved; version numbering
continues from the source (seq == version, so every seq-relative
contract survives verbatim); both tables diverge independently;
pending equality deletes travel, positional ones refuse; the clone's
vacuum never reclaims source files; compact() internalizes to full
independence (source deletable); tag/version selection; loud refusals
on non-fresh destinations and sub-clone time travel.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _src(spark, tmp_path, name="src"):
    t = os.path.join(str(tmp_path), name)
    S.overwrite(spark.range(1, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")),
        t, n_files=3)
    S.merge(spark.createDataFrame([(5, 999), (200, 2000)],
                                  "k long, val long"), t, key="k")
    S.rename_column(t, "val", "score")
    S.delete(spark.createDataFrame([(7,)], "k long"), t, key="k",
             mode="merge-on-read")
    return t


def _rows(spark, t, version=None):
    return sorted(tuple(r) for r in S.read(spark, t, version).collect())


def test_clone_is_identical_zero_copy_and_continues_versions(
        spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    v = S.clone_table(spark, src, dst)
    assert v == S.versions(src)[-1]
    assert S.versions(dst) == [v]  # numbering continues, one commit
    assert _rows(spark, dst) == _rows(spark, src)
    assert not os.path.isdir(os.path.join(dst, "data"))  # zero-copy
    m = S.read_manifest(dst, v)
    assert all(e["external"] for e in m["files"])
    assert m["cloned_from"]["version"] == v
    # the pending equality delete traveled: k=7 invisible in both
    assert S.read(spark, dst).filter("k = 7").count() == 0


def test_divergence_is_isolated_both_ways(spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    S.merge(spark.createDataFrame([(1, -1)], "k long, score long"),
            dst, key="k", mode="merge-on-read")
    S.merge(spark.createDataFrame([(2, -2)], "k long, score long"),
            src, key="k", mode="merge-on-read")
    assert S.read(spark, dst).filter("k = 1").collect()[0].score == -1
    assert S.read(spark, src).filter("k = 1").collect()[0].score == 10
    assert S.read(spark, src).filter("k = 2").collect()[0].score == -2
    assert S.read(spark, dst).filter("k = 2").collect()[0].score == 20


def test_mor_delete_applies_over_cloned_externals(spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    S.delete(spark.createDataFrame([(9,)], "k long"), dst, key="k",
             mode="merge-on-read")
    assert S.read(spark, dst).filter("k = 9").count() == 0
    assert S.read(spark, src).filter("k = 9").count() == 1


def test_clone_vacuum_never_reclaims_source_files(spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    S.append(spark.createDataFrame([(500, 5000)],
                                   "k long, score long"), dst, n_files=1)

    def _n_src_files():
        return sum(len(fs) for _, _, fs in
                   os.walk(os.path.join(src, "data")))

    before = _n_src_files()
    S.vacuum(dst, keep_versions=1)
    assert _n_src_files() == before
    assert _rows(spark, src)  # source intact and readable


def test_compact_internalizes_to_full_independence(spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    want = _rows(spark, dst)
    S.compact(spark, dst, n_files=2)
    m = S.read_manifest(dst, S.versions(dst)[-1])
    assert not any(e.get("external") for e in m["files"])
    S.vacuum(dst, keep_versions=1)
    shutil.rmtree(src)  # the strongest pin: source gone entirely
    assert _rows(spark, dst) == want


def test_positional_pending_and_nonfresh_dest_refuse(spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    with pytest.raises(ValueError, match="already has versions"):
        S.clone_table(spark, src, dst)
    t2 = os.path.join(str(tmp_path), "posrc")
    S.overwrite(spark.range(10).select(F.col("id").alias("k")), t2,
                n_files=1)
    S.delete_where(spark, t2, "k < 3")
    with pytest.raises(ValueError, match="POSITIONAL"):
        S.clone_table(spark, t2, os.path.join(str(tmp_path), "d2"))


def test_clone_at_version_and_tag_and_subclone_travel(spark, tmp_path):
    src = _src(spark, tmp_path)
    S.tag(src, "rel", version=2)
    d_v = os.path.join(str(tmp_path), "dv")
    d_t = os.path.join(str(tmp_path), "dt")
    assert S.clone_table(spark, src, d_v, version=2) == 2
    assert S.clone_table(spark, src, d_t, ref="rel") == 2
    assert _rows(spark, d_v) == _rows(spark, src, 2)
    assert _rows(spark, d_t) == _rows(spark, d_v)
    with pytest.raises(Exception):
        S.read(spark, d_v, 1)  # below the clone point: loud


def test_clone_carries_constraints_and_history(spark, tmp_path):
    src = _src(spark, tmp_path)
    S.purge_deletes(spark, src)
    S.add_constraint(spark, src, "pos", "k > 0")
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    assert S.table_constraints(dst) == {"pos": "k > 0"}
    with pytest.raises(ValueError, match="pos"):
        S.append(spark.createDataFrame([(-1, 0)],
                                       "k long, score long"), dst)
    # rename history carried: era mapping serves pre-rename files
    m = S.read_manifest(dst, S.versions(dst)[-1])
    assert m.get("renames")
    cdc = S.read_row_changes(
        spark, dst, S.versions(dst)[0],
        S.append(spark.createDataFrame([(600, 6000)],
                                       "k long, score long"), dst))
    assert [r.k for r in cdc.collect()] == [600]


def test_relative_clone_survives_root_relocation(spark, tmp_path):
    root = os.path.join(str(tmp_path), "warehouse")
    src = os.path.join(root, "src")
    S.overwrite(spark.range(1, 30).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")),
        src, n_files=2)
    dst = os.path.join(root, "dst")
    S.clone_table(spark, src, dst, relative=True)
    m = S.read_manifest(dst, S.versions(dst)[-1])
    assert all(not os.path.isabs(e["path"]) for e in m["files"])
    moved = os.path.join(str(tmp_path), "relocated")
    shutil.move(root, moved)
    rows = _rows(spark, os.path.join(moved, "dst"))
    assert len(rows) == 29  # the pair stayed valid after the move


def test_clone_sync_fast_forwards_undiverged_clone(spark, tmp_path):
    src = _src(spark, tmp_path)
    S.purge_deletes(spark, src)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    # source advances: merge + append + rename
    S.merge(spark.createDataFrame([(2, -2), (300, 3000)],
                                  "k long, score long"), src, key="k")
    S.append(spark.createDataFrame([(400, 4000)],
                                   "k long, score long"), src, n_files=1)
    synced = S.clone_sync(spark, dst)
    assert synced == S.versions(src)[-2:]
    assert _rows(spark, dst) == _rows(spark, src)
    assert not os.path.isdir(os.path.join(dst, "data"))  # still 0-copy
    # CDC on the clone classifies the synced window EXACTLY like the
    # source (operation/key carried through the sync)
    a = sorted(tuple(r) for r in S.read_row_changes(
        spark, dst, synced[0] - 1, synced[-1]).collect())
    b = sorted(tuple(r) for r in S.read_row_changes(
        spark, src, synced[0] - 1, synced[-1]).collect())
    assert a == b and len(a) > 0
    assert S.clone_sync(spark, dst) == []  # already current: no-op


def test_clone_sync_refuses_diverged_fork(spark, tmp_path):
    src = _src(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    S.clone_table(spark, src, dst)
    S.append(spark.createDataFrame([(500, 5000)],
                                   "k long, score long"), dst, n_files=1)
    S.append(spark.createDataFrame([(600, 6000)],
                                   "k long, score long"), src, n_files=1)
    with pytest.raises(ValueError, match="diverged"):
        S.clone_sync(spark, dst)


def test_clone_sync_relative_pair_after_move(spark, tmp_path):
    root = os.path.join(str(tmp_path), "wh")
    src = os.path.join(root, "src")
    S.overwrite(spark.range(1, 20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")),
        src, n_files=2)
    dst = os.path.join(root, "dst")
    S.clone_table(spark, src, dst, relative=True)
    S.append(spark.createDataFrame([(99, 990)], "k long, val long"),
             src, n_files=1)
    moved = os.path.join(str(tmp_path), "wh2")
    shutil.move(root, moved)
    synced = S.clone_sync(spark, os.path.join(moved, "dst"))
    assert synced == [2]
    assert len(_rows(spark, os.path.join(moved, "dst"))) == 20

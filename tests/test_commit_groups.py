"""Cross-table commit groups (sources/snapshots.py:
publish_commit_group / recover_commit_groups) — atomic-outcome
multi-table publish by roll-forward journal.

Pins: a group publishes every member's branch and stamps the
`txn-<gid>` cut tag; a crash after ANY prefix of members is rolled
FORWARD by recovery (never torn, never doubled); journals are
consumed exactly once; unstaged members refuse before the journal
lands (so a group can never start half-stageable).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _pair(spark, tmp_path):
    a = os.path.join(str(tmp_path), "a")
    b = os.path.join(str(tmp_path), "b")
    S.overwrite(spark.range(5).select(F.col("id").alias("k")), a,
                n_files=1)
    S.overwrite(spark.range(3).select(F.col("id").alias("k")), b,
                n_files=1)
    return a, b


def _stage(spark, a, b):
    S.create_branch(a, "epoch")
    S.branch_append(spark.range(10, 12).select(F.col("id").alias("k")),
                    a, "epoch", n_files=1)
    S.create_branch(b, "epoch")
    S.branch_append(spark.range(20, 24).select(F.col("id").alias("k")),
                    b, "epoch", n_files=1)


def test_group_publishes_all_members_and_tags_the_cut(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    _stage(spark, a, b)
    root = os.path.join(str(tmp_path), "groups")
    out = S.publish_commit_group(root, [(a, "epoch"), (b, "epoch")],
                                 group_id="e1")
    assert out == {a: [2], b: [2]}
    assert S.read(spark, a).count() == 7
    assert S.read(spark, b).count() == 7
    assert S.tags(a)["txn-e1"] == 2 and S.tags(b)["txn-e1"] == 2
    assert S.pending_commit_groups(root) == []
    # the cut tag addresses the group state even after later commits
    S.append(spark.range(100, 103).select(F.col("id").alias("k")), a,
             n_files=1)
    assert S.read(spark, a, ref="txn-e1").count() == 7


def test_crash_mid_publish_rolls_forward(spark, tmp_path, monkeypatch):
    a, b = _pair(spark, tmp_path)
    _stage(spark, a, b)
    root = os.path.join(str(tmp_path), "groups")
    real = S.publish_branch
    calls = {"n": 0}

    def _dies_after_first(table, name):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before member 2")
        return real(table, name)

    monkeypatch.setattr(S, "publish_branch", _dies_after_first)
    with pytest.raises(RuntimeError):
        S.publish_commit_group(root, [(a, "epoch"), (b, "epoch")],
                               group_id="e2")
    monkeypatch.setattr(S, "publish_branch", real)
    # torn state: member A published, member B not, journal pending
    assert S.read(spark, a).count() == 7
    assert S.read(spark, b).count() == 3
    assert S.pending_commit_groups(root) == ["e2"]
    got = S.recover_commit_groups(root)
    assert got["e2"][a] == []  # already graduated before the crash
    assert got["e2"][b] == [2]
    assert S.read(spark, b).count() == 7
    assert S.tags(a)["txn-e2"] == 2 and S.tags(b)["txn-e2"] == 2
    assert S.pending_commit_groups(root) == []


def test_unstaged_member_refuses_before_journal(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    S.create_branch(a, "epoch")
    root = os.path.join(str(tmp_path), "groups")
    with pytest.raises(ValueError, match="not.*found|stage every"):
        S.publish_commit_group(root, [(a, "epoch"), (b, "epoch")])
    assert S.pending_commit_groups(root) == []
    assert S.read(spark, a).count() == 5  # nothing published


def test_recovery_is_idempotent_and_exactly_once(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    _stage(spark, a, b)
    root = os.path.join(str(tmp_path), "groups")
    S.publish_commit_group(root, [(a, "epoch"), (b, "epoch")],
                           group_id="e3")
    assert S.recover_commit_groups(root) == {}  # nothing pending
    assert S.read(spark, a).count() == 7  # not doubled
    assert S.read(spark, b).count() == 7

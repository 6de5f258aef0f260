"""Contract tests for the write-once scratch helper
(sources/scratch.py): signature-keyed paths, build-exactly-once reuse,
concurrent-loser cleanup, and no-debris failure semantics. These are
the invariants the five scratch-materializing queries (partitioned
layout, schema drift, JSONL/CSV/ORC round-trips) rely on to stay
correct under concurrent bench + pytest runs and across layout
changes."""

from __future__ import annotations

import glob
import os

import pytest

from magshield_data_pipeline_spark.sources.scratch import (
    ensure_scratch,
    scratch_path,
)


def test_scratch_path_is_keyed_by_name_sf_and_signature():
    a = scratch_path("thing", "/data/sf0.01", "spec v1")
    assert a.startswith("/tmp/magshield_thing_sf0.01_")
    # same inputs → same path (deterministic reuse across processes)
    assert a == scratch_path("thing", "/data/sf0.01", "spec v1")
    # any input that determines contents must change the path
    assert a != scratch_path("thing", "/data/sf0.01", "spec v2")
    assert a != scratch_path("thing", "/data/sf0.1", "spec v1")
    assert a != scratch_path("other", "/data/sf0.01", "spec v1")
    # trailing slash on the sf dir must not change the key
    assert a == scratch_path("thing", "/data/sf0.01/", "spec v1")


def test_ensure_scratch_builds_once_and_reuses(tmp_path):
    final = str(tmp_path / "once")
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp)
        with open(os.path.join(tmp, "x.txt"), "w") as f:
            f.write("payload")

    assert ensure_scratch(final, build) == final
    assert ensure_scratch(final, build) == final  # no rebuild
    assert len(calls) == 1
    # the build landed in a sibling, never directly in final
    assert calls[0] != final and calls[0].startswith(final + ".tmp.")
    with open(os.path.join(final, "x.txt")) as f:
        assert f.read() == "payload"
    # the temp sibling is gone (renamed into place)
    assert glob.glob(final + ".tmp.*") == []


def test_ensure_scratch_concurrent_loser_keeps_winner(tmp_path):
    """If another process publishes between our existence check and our
    rename, the rename fails, our build is discarded, and the winner's
    tree is served untouched."""
    final = str(tmp_path / "race")

    def build(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "who.txt"), "w") as f:
            f.write("loser")
        # simulate the concurrent winner publishing first
        os.makedirs(final)
        with open(os.path.join(final, "who.txt"), "w") as f:
            f.write("winner")

    assert ensure_scratch(final, build) == final
    with open(os.path.join(final, "who.txt")) as f:
        assert f.read() == "winner"
    assert glob.glob(final + ".tmp.*") == []


def test_ensure_scratch_failed_build_leaves_no_debris(tmp_path):
    final = str(tmp_path / "boom")

    def bad_build(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "partial"), "w") as f:
            f.write("half")
        raise RuntimeError("build died")

    with pytest.raises(RuntimeError, match="build died"):
        ensure_scratch(final, bad_build)
    # nothing published, nothing orphaned — a retry starts clean
    assert not os.path.exists(final)
    assert glob.glob(final + ".tmp.*") == []

    # and the retry with a working build succeeds
    def good_build(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "ok"), "w") as f:
            f.write("done")

    assert ensure_scratch(final, good_build) == final
    assert os.path.exists(os.path.join(final, "ok"))

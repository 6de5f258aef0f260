"""Streaming CDC source over the snapshot ledger (sources/
cdc_stream.py).

The classifier is pinned AGAINST the batch feed (read_row_changes) —
the two must agree bit-for-bit across every copy-on-write commit type
— plus the stream-protocol contracts: deterministic
readBetweenOffsets replay, no offset advance on an idle table,
per-commit batching, schema inference from the manifest, and loud
failures on merge-on-read commits and vacuumed offsets.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import cdc_stream as C
from magshield_data_pipeline_spark.sources import snapshots as S


def _chain(spark, tmp_path, name="t"):
    """overwrite -> merge(update+insert) -> delete -> compact ->
    append: one of every copy-on-write commit type."""
    t = os.path.join(str(tmp_path), name)
    rows = spark.range(1, 200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    )
    S.overwrite(rows, t, n_files=2)
    S.merge(spark.createDataFrame([(5, 999), (300, 3000)],
                                  "k long, val long"), t, key="k", n_files=1)
    S.delete(spark.createDataFrame([(7,), (8,)], "k long"), t, key="k",
             n_files=1)
    S.compact(spark, t, n_files=1, cluster_by=["k"])
    S.append(spark.createDataFrame([(400, 4000)], "k long, val long"),
             t, n_files=1)
    return t


def _reader(t, **opts):
    src = C.LedgerCdcDataSource(
        options={"path": t, **{k.lower(): str(v) for k, v in opts.items()}}
    )
    return src.simpleStreamReader(src.schema()), src


def test_stream_classifier_matches_batch_feed(spark, tmp_path):
    t = _chain(spark, tmp_path)
    reader, _src = _reader(t, maxVersionsPerBatch=10)
    rows, off = reader.read({"version": 1})
    got = sorted(rows)
    assert off == {"version": 5, "snap": 1}
    batch = S.read_row_changes(spark, t, 1, 5)
    want = sorted(
        tuple(r) for r in batch.select(
            "k", "val", "_change_type", "_commit_version"
        ).collect()
    )
    assert got == want


def test_read_between_offsets_replays_exactly(spark, tmp_path):
    t = _chain(spark, tmp_path)
    reader, _ = _reader(t)
    a = list(reader.readBetweenOffsets({"version": 1}, {"version": 3}))
    b = list(reader.readBetweenOffsets({"version": 1}, {"version": 3}))
    assert a == b and len(a) > 0  # deterministic recovery


def test_one_commit_per_batch_by_default(spark, tmp_path):
    t = _chain(spark, tmp_path)
    reader, _ = _reader(t)
    rows, off = reader.read({"version": 1})
    assert off == {"version": 2, "snap": 1}
    assert {r[-1] for r in rows} == {2}  # only commit v2's changes


def test_idle_table_does_not_advance_offset(spark, tmp_path):
    t = _chain(spark, tmp_path)
    reader, _ = _reader(t, maxVersionsPerBatch=10)
    _, off = reader.read({"version": 1})
    rows, off2 = reader.read(off)
    assert off2 == off and list(rows) == []


def test_compact_commit_emits_zero_rows(spark, tmp_path):
    t = _chain(spark, tmp_path)
    reader, _ = _reader(t)
    rows, off = reader.read({"version": 3})  # (3, 4] = the compact
    assert off == {"version": 4, "snap": 1} and list(rows) == []


def test_schema_inferred_from_manifest(spark, tmp_path):
    t = _chain(spark, tmp_path)
    _, src = _reader(t)
    assert src.schema().simpleString() == (
        "struct<k:bigint,val:bigint,_change_type:string,"
        "_commit_version:bigint>"
    )


def test_merge_on_read_commit_raises_loudly(spark, tmp_path):
    t = os.path.join(str(tmp_path), "mor")
    S.overwrite(
        spark.range(5).select(F.col("id").alias("k"),
                              F.col("id").alias("val")),
        t, n_files=1,
    )
    S.delete(spark.createDataFrame([(2,)], "k long"), t, key="k",
             mode="merge-on-read")
    reader, _ = _reader(t)
    with pytest.raises(ValueError, match="merge-on-read"):
        reader.read({"version": 1})


def test_vacuumed_offset_raises_loudly(spark, tmp_path):
    t = _chain(spark, tmp_path)
    S.vacuum(t, keep_versions=1)
    reader, _ = _reader(t)
    with pytest.raises(ValueError, match="vacuumed"):
        reader.read({"version": 1})


def test_initial_snapshot_bootstraps_then_streams_changes(spark, tmp_path):
    # Delta's startingVersion contract: batch 0 = the full v1 state as
    # inserts, later batches = the change feed; applying snapshot +
    # changes reproduces the table exactly
    t = _chain(spark, tmp_path)
    reader, _ = _reader(t, initialSnapshot=True, maxVersionsPerBatch=10)
    off0 = reader.initialOffset()
    assert off0 == {"version": 1, "snap": 0}
    snap, off1 = reader.read(off0)
    snap = list(snap)
    assert off1 == {"version": 1, "snap": 1}
    assert len(snap) == 199 and {r[-2] for r in snap} == {"insert"}
    assert {r[-1] for r in snap} == {1}  # tagged with the start version
    # recovery of the bootstrap batch replays it byte-identically
    assert sorted(reader.readBetweenOffsets(off0, off1)) == sorted(snap)
    changes, off2 = reader.read(off1)
    state = {r[0]: r[1] for r in snap}  # k -> val
    for r in sorted(changes, key=lambda x: x[-1]):
        k, val, ct, _v = r
        if ct in ("insert", "update_postimage"):
            state[k] = val
        elif ct == "delete":
            state.pop(k)
    want = {r.k: r.val for r in
            __import__("magshield_data_pipeline_spark.sources.snapshots",
                       fromlist=["read"]).read(spark, t).collect()}
    assert state == want
    assert off2["version"] == 5


def test_initial_snapshot_refuses_pending_mor_deletes(spark, tmp_path):
    import os

    t = os.path.join(str(tmp_path), "morb")
    S.overwrite(spark.range(5).select(F.col("id").alias("k")), t,
                n_files=1)
    S.delete(spark.createDataFrame([(2,)], "k long"), t, key="k",
             mode="merge-on-read")
    # bootstrap FROM the version carrying pending deletes must refuse
    reader, _ = _reader(t, initialSnapshot=True, startVersion=2)
    with pytest.raises(ValueError, match="snapshot bootstrap"):
        reader.read(reader.initialOffset())

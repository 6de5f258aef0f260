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


def test_merge_on_read_delete_emits_preimages(spark, tmp_path):
    # r12: the stream no longer refuses MOR commits — the equality-
    # delete file's keys resolve to delete pre-images via sequence-
    # number reconciliation (VERDICT r11 item 1)
    t = os.path.join(str(tmp_path), "mor")
    S.overwrite(
        spark.range(5).select(F.col("id").alias("k"),
                              F.col("id").alias("val")),
        t, n_files=1,
    )
    S.delete(spark.createDataFrame([(2,)], "k long"), t, key="k",
             mode="merge-on-read")
    reader, _ = _reader(t)
    rows, off = reader.read({"version": 1})
    assert off == {"version": 2, "snap": 1}
    assert list(rows) == [(2, 2, "delete", 2)]


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


def test_initial_snapshot_applies_pending_mor_deletes(spark, tmp_path):
    # r12: the bootstrap delivers the VISIBLE state at startVersion —
    # pending equality deletes are reconciled exactly like read()
    t = os.path.join(str(tmp_path), "morb")
    S.overwrite(spark.range(5).select(F.col("id").alias("k")), t,
                n_files=1)
    S.delete(spark.createDataFrame([(2,)], "k long"), t, key="k",
             mode="merge-on-read")
    reader, _ = _reader(t, initialSnapshot=True, startVersion=2)
    snap, off = reader.read(reader.initialOffset())
    got = sorted(r[0] for r in snap)
    want = sorted(r.k for r in S.read(spark, t, 2).collect())
    assert got == want == [0, 1, 3, 4]
    assert off == {"version": 2, "snap": 1}


def _mor_chain(spark, tmp_path, name="mor_t"):
    """The production-shaped chain the r11 verdict asked the stream to
    survive: overwrite -> MOR merge (update + insert) -> MOR delete ->
    append RE-INSERTING a deleted key (the sequence-number contract:
    it must NOT be suppressed) -> metadata-only set-constraint ->
    compact (materializes the deletes; silent)."""
    t = os.path.join(str(tmp_path), name)
    rows = spark.range(1, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    )
    S.overwrite(rows, t, n_files=2)
    S.merge(spark.createDataFrame([(5, 999), (100, 1000)],
                                  "k long, val long"),
            t, key="k", mode="merge-on-read")
    S.delete(spark.createDataFrame([(9,), (100,)], "k long"), t, key="k",
             mode="merge-on-read")
    S.append(spark.createDataFrame([(9, 90909)], "k long, val long"),
             t, n_files=1)
    S.add_constraint(spark, t, "k_pos", "k > 0")
    S.compact(spark, t, n_files=1, cluster_by=["k"])
    return t


def test_mor_chain_matches_batch_feed(spark, tmp_path):
    t = _mor_chain(spark, tmp_path)
    reader, _ = _reader(t, maxVersionsPerBatch=10)
    rows, off = reader.read({"version": 1})
    got = sorted(rows)
    assert off == {"version": 6, "snap": 1}
    batch = S.read_row_changes(spark, t, 1, 6)
    want = sorted(
        tuple(r) for r in batch.select(
            "k", "val", "_change_type", "_commit_version"
        ).collect()
    )
    assert got == want


def test_mor_merge_emits_pre_post_pairs(spark, tmp_path):
    t = _mor_chain(spark, tmp_path)
    reader, _ = _reader(t)
    rows, _ = reader.read({"version": 1})  # (1, 2] = the MOR merge
    got = sorted(rows)
    assert got == [
        (5, 50, "update_preimage", 2),
        (5, 999, "update_postimage", 2),
        (100, 1000, "insert", 2),
    ]


def test_reinsert_after_mor_delete_is_delivered(spark, tmp_path):
    # Iceberg v2 sequence numbers: the v3 delete of k=9 applies only
    # to OLDER files, so the v4 re-insert must stream as an insert
    t = _mor_chain(spark, tmp_path)
    reader, _ = _reader(t)
    rows, _ = reader.read({"version": 3})  # (3, 4] = the re-insert
    assert list(rows) == [(9, 90909, "insert", 4)]
    # and the final table state keeps it (read-side contract)
    assert S.read(spark, t).filter(F.col("k") == 9).count() == 1


def test_metadata_only_commit_advances_without_wedging(spark, tmp_path):
    # ADVICE r11 high: a set-constraint commit permanently wedged the
    # stream (ValueError per trigger) — it must emit zero rows and
    # advance the offset
    t = _mor_chain(spark, tmp_path)
    reader, _ = _reader(t)
    rows, off = reader.read({"version": 4})  # (4, 5] = set-constraint
    assert list(rows) == [] and off == {"version": 5, "snap": 1}
    # and the compact after it is silent too
    rows, off = reader.read(off)
    assert list(rows) == [] and off == {"version": 6, "snap": 1}


def test_rollback_streams_as_multiset_diff(spark, tmp_path):
    # ADVICE r11 high: rollback (key-less, file-changing) wedged the
    # stream; it must degrade to the overwrite-style visible-state
    # diff, pinned against the batch feed
    t = os.path.join(str(tmp_path), "rb")
    S.overwrite(spark.range(1, 10).select(F.col("id").alias("k")), t,
                n_files=1)
    S.append(spark.createDataFrame([(50,), (51,)], "k long"), t, n_files=1)
    S.rollback(t, 1)  # v3: drops the appended file
    reader, _ = _reader(t)
    rows, off = reader.read({"version": 2})  # (2, 3] = the rollback
    got = sorted(rows)
    assert off == {"version": 3, "snap": 1}
    assert got == [(50, "delete", 3), (51, "delete", 3)]
    batch = S.read_row_changes(spark, t, 2, 3)
    want = sorted(tuple(r) for r in
                  batch.select("k", "_change_type",
                               "_commit_version").collect())
    assert got == want


def test_rollback_past_mor_delete_streams_undelete(spark, tmp_path):
    # a rollback that DROPS a pending equality-delete file makes its
    # rows visible again — both feeds must emit them as inserts
    t = os.path.join(str(tmp_path), "undel")
    S.overwrite(
        spark.range(1, 10).select(F.col("id").alias("k"),
                                  (F.col("id") * 10).alias("val")),
        t, n_files=1,
    )
    S.delete(spark.createDataFrame([(3,), (4,)], "k long"), t, key="k",
             mode="merge-on-read")
    S.rollback(t, 1)  # v3: the delete file is gone — k=3,4 undeleted
    reader, _ = _reader(t)
    rows, off = reader.read({"version": 2})
    got = sorted(rows)
    assert off == {"version": 3, "snap": 1}
    assert got == [(3, 30, "insert", 3), (4, 40, "insert", 3)]
    batch = S.read_row_changes(spark, t, 2, 3)
    want = sorted(tuple(r) for r in
                  batch.select("k", "val", "_change_type",
                               "_commit_version").collect())
    assert got == want


def test_partition_values_restore_typed(spark, tmp_path):
    # ADVICE r11 medium: identity-partition values restored as raw
    # hive-directory STRINGS corrupted non-string fields — they must
    # come back typed through the stream schema
    t = os.path.join(str(tmp_path), "parted")
    S.overwrite(
        spark.range(1, 7).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).alias("bucket"),
        ),
        t, n_files=1,
    )
    S.append(
        spark.range(10, 14).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).alias("bucket"),
        ),
        t, n_files=1, partition_by="bucket",
    )
    reader, _ = _reader(t)
    rows, _ = reader.read({"version": 1})
    got = sorted(rows)
    assert all(isinstance(r[1], int) for r in got), got
    assert got == [(10, 0, "insert", 2), (11, 1, "insert", 2),
                   (12, 0, "insert", 2), (13, 1, "insert", 2)]


def test_mor_replay_between_offsets_deterministic(spark, tmp_path):
    t = _mor_chain(spark, tmp_path)
    reader, _ = _reader(t)
    a = list(reader.readBetweenOffsets({"version": 1}, {"version": 4}))
    b = list(reader.readBetweenOffsets({"version": 1}, {"version": 4}))
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# r12: distributed stream reader (executor-side materialization)

def _dist_reader(t, **opts):
    src = C.LedgerCdcDistDataSource(
        options={"path": t, **{k.lower(): str(v) for k, v in opts.items()}}
    )
    return src.streamReader(src.schema()), src


def _drain_dist(reader, start):
    end = reader.latestOffset()
    rows = []
    for p in reader.partitions(start, end):
        rows.extend(reader.read(p))
    return rows, end


def test_dist_partition_plan_shapes(spark, tmp_path):
    t = _mor_chain(spark, tmp_path)
    reader, _ = _dist_reader(t)
    parts = reader.partitions({"version": 1, "snap": 1},
                              {"version": 6, "snap": 1})
    kinds = [p.kind for p in parts]
    # v2 MOR merge + v3 MOR delete -> commit_diff each; v4 append ->
    # one insert_file per added file; v5 set-constraint + v6 compact
    # -> no partitions at all
    assert kinds == ["commit_diff", "commit_diff", "insert_file"]


def test_dist_append_fans_out_per_file(spark, tmp_path):
    t = os.path.join(str(tmp_path), "fan")
    S.overwrite(spark.range(10).select(F.col("id").alias("k")), t,
                n_files=1)
    S.append(spark.range(10, 40).select(F.col("id").alias("k")), t,
             n_files=3)
    reader, _ = _dist_reader(t)
    parts = reader.partitions({"version": 1, "snap": 1},
                              {"version": 2, "snap": 1})
    assert [p.kind for p in parts] == ["insert_file"] * 3


def test_dist_rows_match_simple_reader_cow_and_mor(spark, tmp_path):
    for chain, last in ((_chain, 5), (_mor_chain, 6)):
        t = chain(spark, tmp_path, name=f"par_{last}")
        simple, _ = _reader(t, maxVersionsPerBatch=10)
        want = sorted(simple._range_rows(1, last))
        dist, _ = _dist_reader(t)
        got, end = _drain_dist(dist, {"version": 1, "snap": 1})
        assert end == {"version": last, "snap": 1}
        assert sorted(got) == want


def test_dist_bootstrap_applies_deletes_per_file(spark, tmp_path):
    t = os.path.join(str(tmp_path), "dboot")
    S.overwrite(spark.range(9).select(F.col("id").alias("k")), t,
                n_files=3)
    S.delete(spark.createDataFrame([(2,), (7,)], "k long"), t, key="k",
             mode="merge-on-read")
    simple, _ = _reader(t, initialSnapshot=True, startVersion=2)
    want = sorted(simple._snapshot_rows())
    dist, _ = _dist_reader(t, initialSnapshot=True, startVersion=2)
    parts = dist.partitions({"version": 2, "snap": 0},
                            {"version": 2, "snap": 1})
    assert [p.kind for p in parts] == ["snapshot_file"] * 3
    got = sorted(r for p in parts for r in dist.read(p))
    assert got == want


def test_dist_stream_end_to_end_matches_batch_feed(spark, tmp_path):
    import tempfile
    import uuid as _uuid

    t = _mor_chain(spark, tmp_path, name="dist_e2e")
    C.register(spark)
    name = f"dist_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("ledger_cdc_dist")
        .option("path", t)
        .option("startversion", 1)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.table(name)
        .select("k", "val", "_change_type", "_commit_version").collect()
    )
    batch = S.read_row_changes(spark, t, 1, 6)
    want = sorted(
        tuple(r) for r in batch.select(
            "k", "val", "_change_type", "_commit_version").collect()
    )
    assert got == want


def test_stream_across_add_column_commit(spark, tmp_path):
    # an add-column evolution mid-range: the stream schema is the
    # LATEST manifest's, and pre-evolution commits null-fill the new
    # column — pinned against the batch feed
    t = os.path.join(str(tmp_path), "evo")
    S.overwrite(spark.range(3).select(F.col("id").alias("k")), t,
                n_files=1)
    S.append(spark.createDataFrame([(10, "x"), (11, "y")],
                                   "k long, tag string"), t, n_files=1)
    S.append(spark.createDataFrame([(20, "z")], "k long, tag string"),
             t, n_files=1)
    reader, src = _reader(t, maxVersionsPerBatch=10)
    assert "tag" in src.schema().fieldNames()
    rows, off = reader.read({"version": 1})
    got = sorted(rows)
    assert off == {"version": 3, "snap": 1}
    batch = S.read_row_changes(spark, t, 1, 3)
    want = sorted(tuple(r) for r in batch.select(
        "k", "tag", "_change_type", "_commit_version").collect())
    assert got == want
    assert (10, "x", "insert", 2) in got
    # dist twin agrees
    dist, _ = _dist_reader(t)
    drows, _ = _drain_dist(dist, {"version": 1, "snap": 1})
    assert sorted(drows) == want


def test_column_projection_feed(spark, tmp_path):
    # option('columns') = the CDC feed OF THE PROJECTED VIEW: reads
    # prune to the named columns, the merge key is materialized
    # internally for update pairing (and stripped), and a commit
    # touching ONLY unselected columns emits nothing
    t = os.path.join(str(tmp_path), "proj")
    S.overwrite(
        spark.range(1, 6).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("val"),
            F.lit("pad").alias("wide"),
        ),
        t, n_files=1,
    )
    # v2: change val for k=2 (selected) and wide for k=3 (unselected)
    S.merge(
        spark.createDataFrame([(2, 999, "pad"), (3, 30, "CHANGED")],
                              "k long, val long, wide string"),
        t, key="k", n_files=1,
    )
    # full feed sees both updates
    full, _ = _reader(t)
    rows_full, _ = full.read({"version": 1})
    assert {r[0] for r in rows_full if r[-2] == "update_postimage"} \
        == {2, 3}
    # projected feed (val only, key EXCLUDED from the projection):
    # the k=3 change cancels, the k=2 change pairs
    src = C.LedgerCdcDataSource(
        options={"path": t, "columns": "val"}
    )
    assert src.schema().fieldNames() == [
        "val", "_change_type", "_commit_version"]
    reader = src.simpleStreamReader(src.schema())
    rows, _ = reader.read({"version": 1})
    assert sorted(rows) == [
        (20, "update_preimage", 2), (999, "update_postimage", 2)]
    # dist twin under the same projection agrees
    dsrc = C.LedgerCdcDistDataSource(
        options={"path": t, "columns": "val"}
    )
    dreader = dsrc.streamReader(dsrc.schema())
    got = sorted(r for p in dreader.partitions(
        {"version": 1, "snap": 1}, {"version": 2, "snap": 1})
        for r in dreader.read(p))
    assert got == [(20, "update_preimage", 2),
                   (999, "update_postimage", 2)]
    # unknown column fails loudly
    bad = C.LedgerCdcDataSource(options={"path": t, "columns": "nope"})
    with pytest.raises(ValueError, match="not in the table schema"):
        bad.schema()


def test_column_projection_with_mor_deletes(spark, tmp_path):
    # the delete KEY can be outside the projection: it is read as a
    # working column for the anti-join and stripped from the output
    t = os.path.join(str(tmp_path), "projmor")
    S.overwrite(
        spark.range(1, 6).select(F.col("id").alias("k"),
                                 (F.col("id") * 10).alias("val")),
        t, n_files=1,
    )
    S.delete(spark.createDataFrame([(4,)], "k long"), t, key="k",
             mode="merge-on-read")
    src = C.LedgerCdcDataSource(options={"path": t, "columns": "val"})
    reader = src.simpleStreamReader(src.schema())
    rows, _ = reader.read({"version": 1})
    assert list(rows) == [(40, "delete", 2)]
    # bootstrap at v2 applies the pending delete under the projection
    src2 = C.LedgerCdcDataSource(options={
        "path": t, "columns": "val", "initialsnapshot": "true",
        "startversion": "2"})
    r2 = src2.simpleStreamReader(src2.schema())
    snap, _ = r2.read(r2.initialOffset())
    assert sorted(x[0] for x in snap) == [10, 20, 30, 50]


def test_dist_stream_checkpoint_restart_resumes(spark, tmp_path):
    # stop the stream, commit more, restart on the SAME checkpoint:
    # only the new commits are delivered (offset = ledger version,
    # persisted by the engine across restarts)
    import tempfile
    import uuid as _uuid

    t = os.path.join(str(tmp_path), "restart")
    S.overwrite(spark.range(5).select(F.col("id").alias("k")), t,
                n_files=1)
    S.append(spark.createDataFrame([(10,)], "k long"), t, n_files=1)
    C.register(spark)
    ckpt = tempfile.mkdtemp(prefix="ckpt_restart_")
    sink = os.path.join(str(tmp_path), f"sink_{_uuid.uuid4().hex[:8]}")

    def _run():
        # a FILE sink (memory sinks refuse checkpoint recovery)
        q = (
            spark.readStream.format("ledger_cdc_dist")
            .option("path", t)
            .option("startversion", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    got1 = sorted(r.k for r in spark.read.parquet(sink).collect())
    assert got1 == [10]  # (1, 2] only
    # more commits land while the stream is down
    S.append(spark.createDataFrame([(20,), (21,)], "k long"), t,
             n_files=1)
    S.delete(spark.createDataFrame([(10,)], "k long"), t, key="k",
             mode="merge-on-read")
    _run()
    got2 = sorted(
        (r.k, r._change_type)
        for r in spark.read.parquet(sink).collect()
    )
    # ONLY the new commits appended: the restart resumed at v2, not v1
    assert got2 == [(10, "delete"), (10, "insert"),
                    (20, "insert"), (21, "insert")]


# ---------------------------------------------------------------------------
# r12 session 2: predicate pushdown (option('filters', ...))

def test_filtered_feed_prunes_files_and_rows(spark, tmp_path):
    t = os.path.join(str(tmp_path), "filt")
    S.overwrite(spark.range(1).select(F.col("id").alias("k"),
                                      F.col("id").alias("val")),
                t, n_files=1)
    # a CLUSTERED append: 4 files with disjoint k ranges
    rows = spark.range(1, 401).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val"))
    e = S._write_data_files(rows, t, 4, cluster_by=["k"])
    S._publish_manifest(t, "append", e, carry=True,
                        schema=rows.schema.jsonValue())
    # dist reader: the k >= 301 filter must plan ONE insert partition
    dsrc = C.LedgerCdcDistDataSource(
        options={"path": t, "filters": "k>=301"})
    dr = dsrc.streamReader(dsrc.schema())
    parts = dr.partitions({"version": 1, "snap": 1},
                          {"version": 2, "snap": 1})
    assert [p.kind for p in parts] == ["insert_file"]  # 3 of 4 pruned
    got = sorted(r for p in parts for r in dr.read(p))
    assert len(got) == 100 and all(r[0] >= 301 for r in got)
    # simple reader agrees
    src = C.LedgerCdcDataSource(options={"path": t, "filters": "k>=301"})
    rr = src.simpleStreamReader(src.schema())
    rows2, _ = rr.read({"version": 1})
    assert sorted(rows2) == got


def test_filter_boundary_crossing_updates_relabel(spark, tmp_path):
    # the filtered feed is the feed OF THE FILTERED VIEW: an update
    # moving a row INTO the range is an insert, OUT of it a delete,
    # WITHIN it a pre/post pair
    t = os.path.join(str(tmp_path), "fb")
    S.overwrite(
        spark.createDataFrame([(1, 5), (2, 50), (3, 60)],
                              "k long, val long"),
        t, n_files=1,
    )
    S.merge(
        spark.createDataFrame(
            [(1, 40), (2, 7), (3, 70)], "k long, val long"),
        t, key="k", n_files=1,
    )
    src = C.LedgerCdcDataSource(options={"path": t, "filters": "val>=10"})
    reader = src.simpleStreamReader(src.schema())
    rows, _ = reader.read({"version": 1})
    got = sorted(rows)
    assert got == [
        (1, 40, "insert", 2),             # entered the range
        (2, 50, "delete", 2),             # left the range
        (3, 60, "update_preimage", 2),    # moved within it
        (3, 70, "update_postimage", 2),
    ]
    # value+sign sets match batch-feed-then-filter (only labels of
    # boundary crossers differ, by design)
    batch = S.read_row_changes(spark, t, 1, 2).filter("val >= 10")
    sign = {"insert": 1, "update_postimage": 1,
            "update_preimage": -1, "delete": -1}
    want = sorted((r.k, r.val, sign[r._change_type])
                  for r in batch.collect())
    assert sorted((r[0], r[1], sign[r[2]]) for r in got) == want


def test_filter_column_outside_projection(spark, tmp_path):
    t = os.path.join(str(tmp_path), "fp")
    S.overwrite(
        spark.range(1, 9).select(F.col("id").alias("k"),
                                 (F.col("id") * 10).alias("val")),
        t, n_files=1,
    )
    S.append(spark.range(9, 15).select(F.col("id").alias("k"),
                                       (F.col("id") * 10).alias("val")),
             t, n_files=1)
    src = C.LedgerCdcDataSource(
        options={"path": t, "columns": "val", "filters": "k>=12"})
    reader = src.simpleStreamReader(src.schema())
    rows, _ = reader.read({"version": 1})
    assert sorted(rows) == [(120, "insert", 2), (130, "insert", 2),
                            (140, "insert", 2)]


def test_filter_parse_and_bootstrap(spark, tmp_path):
    t = os.path.join(str(tmp_path), "fparse")
    S.overwrite(spark.range(10).select(F.col("id").alias("k")), t,
                n_files=1)
    with pytest.raises(ValueError, match="cannot parse filter"):
        C.LedgerCdcDataSource(
            options={"path": t, "filters": "k !! 3"}
        ).simpleStreamReader(
            C.LedgerCdcDataSource(options={"path": t}).schema())
    with pytest.raises(ValueError, match="not in the table schema"):
        C.LedgerCdcDataSource(
            options={"path": t, "filters": "zz>=1"}
        ).simpleStreamReader(
            C.LedgerCdcDataSource(options={"path": t}).schema())
    src = C.LedgerCdcDataSource(
        options={"path": t, "filters": "k>=4;k<8",
                 "initialsnapshot": "true"})
    reader = src.simpleStreamReader(src.schema())
    snap, _ = reader.read(reader.initialOffset())
    assert sorted(r[0] for r in snap) == [4, 5, 6, 7]

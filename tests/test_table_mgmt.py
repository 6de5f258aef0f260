"""Table management tier (sources/snapshots.py): tags, rollback,
CHECK constraints.

Pins: tags are immutable refs and vacuum retention pins; rollback is
a metadata-only forward commit restoring the target's full state
(files, schema, constraints) with history preserved; constraints are
versioned manifest metadata validated on existing data at ADD time
and on incoming rows (only) at every write path, with SQL CHECK null
semantics.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _t(spark, tmp_path, name="t"):
    t = os.path.join(str(tmp_path), name)
    S.overwrite(
        spark.range(10).select(F.col("id").alias("k"),
                               (F.col("id") * 10).alias("v")),
        t, n_files=1,
    )
    return t


def test_tags_resolve_and_are_immutable(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.append(spark.createDataFrame([(99, 990)], "k long, v long"), t)
    assert S.tag(t, "rel-1", version=1) == 1
    assert S.tag(t, "head") == 2  # default: latest
    assert S.tags(t) == {"rel-1": 1, "head": 2}
    assert S.read(spark, t, ref="rel-1").count() == 10
    with pytest.raises(ValueError, match="immutable"):
        S.tag(t, "rel-1", version=2)
    S.delete_tag(t, "rel-1")
    with pytest.raises(ValueError, match="not found"):
        S.read(spark, t, ref="rel-1")
    with pytest.raises(ValueError, match="unsafe"):
        S.tag(t, "../escape")


def test_vacuum_retains_tagged_versions(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.tag(t, "pin", version=1)
    for i in range(3):
        S.append(spark.createDataFrame([(100 + i, 0)], "k long, v long"), t)
    S.vacuum(t, keep_versions=1)
    assert S.versions(t) == [1, 4]  # tag pinned v1 through the window
    assert S.read(spark, t, ref="pin").count() == 10
    S.delete_tag(t, "pin")
    S.vacuum(t, keep_versions=1)
    assert S.versions(t) == [4]  # unpinned: normal retention applies


def test_rollback_is_metadata_only_and_history_preserving(spark, tmp_path):
    t = _t(spark, tmp_path)
    before_files = {e["path"] for e in S.read_manifest(t, 1)["files"]}
    S.merge(spark.createDataFrame([(3, 999)], "k long, v long"), t,
            key="k")
    v = S.rollback(t, 1)
    assert v == 3
    m = S.read_manifest(t, 3)
    assert m["operation"] == "rollback" and m["rollback_of"] == 1
    # zero data I/O: v1's files re-listed BY REFERENCE
    assert {e["path"] for e in m["files"]} == before_files
    assert sorted(r.v for r in S.read(spark, t).collect())[:4] \
        == [0, 10, 20, 30]
    # history preserved: the rolled-back merge stays readable
    assert S.read(spark, t, 2).filter("k = 3").head().v == 999
    # rolling back to the current state is a no-op, not an empty commit
    assert S.rollback(t, 3) == 3
    assert S.versions(t) == [1, 2, 3]


def test_constraint_guards_every_write_path(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.add_constraint(spark, t, "v_nonneg", "v >= 0")
    bad = spark.createDataFrame([(50, -1)], "k long, v long")
    with pytest.raises(ValueError, match="v_nonneg"):
        S.append(bad, t)
    with pytest.raises(ValueError, match="v_nonneg"):
        S.overwrite(bad, t)
    with pytest.raises(ValueError, match="v_nonneg"):
        S.merge(bad, t, key="k")
    with pytest.raises(ValueError, match="v_nonneg"):
        S.append_stream_batch(bad, t, batch_id=999)
    # refusal leaves the table untouched (refused BEFORE files land)
    assert S.versions(t) == [1, 2]
    assert S.read(spark, t).count() == 10
    # a conforming write still flows
    S.append(spark.createDataFrame([(50, 5)], "k long, v long"), t)
    assert S.read(spark, t).count() == 11


def test_constraint_null_passes_sql_check_semantics(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.add_constraint(spark, t, "v_nonneg", "v >= 0")
    S.append(spark.createDataFrame([(77, None)], "k long, v long"), t)
    assert S.read(spark, t).filter("k = 77").head().v is None


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="existing data violates"):
        S.add_constraint(spark, t, "k_small", "k < 5")
    assert S.table_constraints(t) == {}  # nothing committed


def test_constraints_survive_commits_and_rollback_restores_them(
        spark, tmp_path):
    t = _t(spark, tmp_path)
    S.add_constraint(spark, t, "v_nonneg", "v >= 0")  # v2
    S.merge(spark.createDataFrame([(3, 333)], "k long, v long"), t,
            key="k")  # v3
    S.compact(spark, t, n_files=1)  # v4
    assert S.table_constraints(t) == {"v_nonneg": "v >= 0"}
    # rollback restores the TARGET's metadata: pre-constraint v1 state
    S.rollback(t, 1)
    assert S.table_constraints(t) == {}
    # ... and rolling forward to v2's state brings it back
    S.rollback(t, 2)
    assert S.table_constraints(t) == {"v_nonneg": "v >= 0"}
    S.drop_constraint(t, "v_nonneg")
    assert S.table_constraints(t) == {}
    S.append(spark.createDataFrame([(60, -6)], "k long, v long"), t)


def test_constraint_time_travel_reads_versioned_metadata(spark, tmp_path):
    t = _t(spark, tmp_path)
    v2 = S.add_constraint(spark, t, "v_nonneg", "v >= 0")
    assert S.read_manifest(t, 1).get("constraints") is None
    assert S.read_manifest(t, v2)["constraints"] == {"v_nonneg": "v >= 0"}


def test_optimize_binpacks_only_small_files(spark, tmp_path):
    t = os.path.join(str(tmp_path), "opt")
    S.overwrite(spark.range(1000).select(F.col("id").alias("k")), t,
                n_files=1)  # one adequate file
    for i in range(4):
        S.append(spark.range(i * 10, i * 10 + 10)
                 .select(F.col("id").alias("k")), t, n_files=1)
    big = S.read_manifest(t, 1)["files"][0]["path"]
    v = S.optimize(spark, t, small_file_rows=100)
    assert v == 6
    m = S.read_manifest(t, 6)
    assert m["operation"] == "compact" and m["mode"] == "bin-pack"
    paths = {e["path"] for e in m["files"]}
    assert big in paths and len(paths) == 2  # 4 small -> 1, big carried
    assert S.read(spark, t).count() == 1040  # nothing lost or invented
    # maintenance is silent for CDC subscribers
    assert S.read_row_changes(spark, t, 5, 6).count() == 0


def test_optimize_noop_when_nothing_to_pack(spark, tmp_path):
    t = _t(spark, tmp_path)
    assert S.optimize(spark, t, small_file_rows=1) is None  # no small
    S.append(spark.createDataFrame([(1, 1)], "k long, v long"), t,
             n_files=1)
    assert S.optimize(spark, t, small_file_rows=2) is None  # only one
    assert S.versions(t) == [1, 2]  # no churn commits


def test_optimize_respects_target_rows(spark, tmp_path):
    t = os.path.join(str(tmp_path), "opt2")
    S.overwrite(spark.range(10).select(F.col("id").alias("k")), t,
                n_files=1)
    for i in range(4):
        S.append(spark.range(100).select(F.col("id").alias("k")), t,
                 n_files=1)
    # 410 small rows at 200/file -> 3 output files
    S.optimize(spark, t, small_file_rows=1000, target_rows=200)
    assert len(S.read_manifest(t, 6)["files"]) == 3


def test_history_and_files_metadata_tables(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.merge(spark.createDataFrame([(3, 333)], "k long, v long"), t,
            key="k")
    S.rollback(t, 1)
    h = {r.version: r for r in S.history(spark, t).collect()}
    assert [h[v].operation for v in (1, 2, 3)] \
        == ["overwrite", "merge", "rollback"]
    assert h[2].key == "k" and h[3].rollback_of == 1
    assert h[1].total_rows == 10 and h[1].committed_at is not None
    f = S.files_table(spark, t).collect()
    assert all(r.rows > 0 and r.path.startswith("data/") for r in f)
    # partition + bloom metadata surface through .files
    t2 = os.path.join(str(tmp_path), "t2")
    S.overwrite(
        spark.range(8).select(F.col("id").alias("k"),
                              (F.col("id") % 2).alias("p")),
        t2, n_files=1, bloom_for={"k": 1 << 10},
    )
    r0 = S.files_table(spark, t2).head()
    assert r0.bloom_cols == "k"


def test_ndv_sketch_merge_equals_single_pass(spark, tmp_path):
    # HLL register merge is a max: the 8-file metadata estimate must
    # EXACTLY equal a fresh single-file sketch over the same rows
    t = os.path.join(str(tmp_path), "ndv")
    rows = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("g"))
    S.overwrite(rows, t, n_files=8, ndv_for=["k", "g"])
    multi = {c: S.approx_ndv(t, c) for c in ("k", "g")}
    S.compact(spark, t, n_files=1, ndv_for=["k", "g"])
    for c in ("k", "g"):
        assert S.approx_ndv(t, c) == multi[c]
    # accuracy: within 15% for both the wide and the tiny cardinality
    assert abs(multi["k"] / 20000 - 1) <= 0.15
    assert abs(multi["g"] / 31 - 1) <= 0.15


def test_ndv_missing_sketch_fails_loudly(spark, tmp_path):
    t = os.path.join(str(tmp_path), "ndv2")
    S.overwrite(spark.range(10).select(F.col("id").alias("k")), t,
                n_files=1, ndv_for=["k"])
    S.append(spark.range(10, 20).select(F.col("id").alias("k")), t,
             n_files=1)  # no sketch on this commit
    with pytest.raises(ValueError, match="no NDV sketch"):
        S.approx_ndv(t, "k")
    # the sketched-only version still answers (time travel)
    assert abs(S.approx_ndv(t, "k", version=1) / 10 - 1) <= 0.3


def test_hidden_partition_bucket_prunes_and_stays_sound(spark, tmp_path):
    t = os.path.join(str(tmp_path), "hp")
    rows = spark.range(0, 5000).select(F.col("id").alias("k"),
                                       (F.col("id") * 10).alias("v"))
    S.overwrite(rows, t, n_files=1, partition_by=("bucket", "k", 8))
    man = S.read_manifest(t, 1)
    assert len(man["files"]) == 8
    assert man["files"][0]["partition_spec"]["transform"] == "bucket"
    got = S.read(spark, t, key_in=("k", [3, 4444]))
    nf = got.select(F.input_file_name()).distinct().count()
    assert nf <= 2  # at most one bucket per probe key
    assert sorted(r.v for r in got.filter("k IN (3, 4444)").collect()) \
        == [30, 44440]
    # the raw column survives in the data files (hidden layout)
    assert S.read(spark, t).columns == ["k", "v"]
    assert S.read(spark, t).count() == 5000


def test_hidden_partition_truncate_int_and_string(spark, tmp_path):
    t = os.path.join(str(tmp_path), "hpt")
    rows = spark.range(0, 1000).select(F.col("id").alias("k"))
    S.overwrite(rows, t, n_files=1, partition_by=("truncate", "k", 100))
    got = S.read(spark, t, key_in=("k", [250]))
    assert got.select(F.input_file_name()).distinct().count() == 1
    assert got.filter("k = 250").count() == 1
    t2 = os.path.join(str(tmp_path), "hps")
    srows = spark.range(0, 100).select(
        F.concat(F.lit("cat_"), (F.col("id") % 5).cast("string"),
                 F.lit("_"), F.col("id").cast("string")).alias("s"))
    S.overwrite(srows, t2, n_files=1, partition_by=("truncate", "s", 5))
    got2 = S.read(spark, t2, key_in=("s", ["cat_3_13"]))
    assert got2.select(F.input_file_name()).distinct().count() == 1
    assert got2.filter("s = 'cat_3_13'").count() == 1


def test_partition_spec_evolution_mixed_commits(spark, tmp_path):
    # spec evolves per commit: bucket entries + identity entries +
    # unpartitioned entries coexist; the lookup prunes each by its
    # OWN recorded spec and keeps the rest conservatively
    t = os.path.join(str(tmp_path), "hpe")
    rows = spark.range(0, 400).select(F.col("id").alias("k"),
                                      (F.col("id") % 4).alias("p"))
    S.overwrite(rows, t, n_files=1, partition_by=("bucket", "k", 4))
    S.append(spark.createDataFrame([(1000, 0)], "k long, p long"), t,
             n_files=1)  # unpartitioned commit
    got = S.read(spark, t, key_in=("k", [7, 1000]))
    found = sorted(r.k for r in got.filter("k IN (7, 1000)").collect())
    assert found == [7, 1000]
    nf = got.select(F.input_file_name()).distinct().count()
    # one bucket per probe key (k=1000's bucket file is kept too —
    # the transform can't know the key is absent) + the conservative
    # unpartitioned file
    assert nf <= 3


def test_table_rows_metadata_count(spark, tmp_path):
    t = _t(spark, tmp_path)
    assert S.table_rows(t) == 10
    S.append(spark.createDataFrame([(50, 5)], "k long, v long"), t,
             n_files=1)
    assert S.table_rows(t) == 11
    assert S.table_rows(t, version=1) == 10  # time travel counts too
    S.delete(spark.createDataFrame([(1,)], "k long"), t, key="k",
             mode="merge-on-read")
    with pytest.raises(ValueError, match="compact"):
        S.table_rows(t)  # pending MOR deletes: refuse, don't overcount
    S.compact(spark, t, n_files=1)
    assert S.table_rows(t) == 10


def test_stats_planner_broadcasts_the_metadata_small_side(spark, tmp_path):
    from magshield_data_pipeline_spark.plans.modern_queries import (
        snapshot_stats_planner,
    )

    df = snapshot_stats_planner(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the metadata decision held
    audit = [r for r in df.collect() if r.nation_key == -1]
    assert audit[0].n_orders == 1  # dim nominated, as metadata says


def test_hidden_partition_month_transform(spark, tmp_path):
    t = os.path.join(str(tmp_path), "hpm")
    rows = spark.sql(
        "SELECT id AS k, date_add(DATE'2024-01-01', CAST(id * 13 AS INT)"
        ") AS d FROM range(30)"
    )
    S.overwrite(rows, t, n_files=1, partition_by=("month", "d"))
    vals = {e["partition"]["_p_month_d"]
            for e in S.read_manifest(t, 1)["files"]}
    assert "2024-01" in vals and len(vals) > 5  # one dir per month
    got = S.read(spark, t, partitions={"_p_month_d": ["2024-03"]})
    assert got.count() > 0
    assert all(str(r.d).startswith("2024-03") for r in got.collect())
    # the raw date column is intact in the files
    assert S.read(spark, t).count() == 30


def test_set_constraint_commit_carries_schema(spark, tmp_path):
    # r12 regression (latent since r11): a metadata-only set-constraint
    # commit DROPPED the recorded schema, reverting readers of the new
    # version to footer inference — on an evolved table that loses the
    # add-column null-fill
    import os

    t = os.path.join(str(tmp_path), "evo_cons")
    S.overwrite(spark.range(5).select(F.col("id").alias("k")), t,
                n_files=1)
    S.append(spark.createDataFrame([(10, "x")], "k long, tag string"),
             t, n_files=1)  # add-column evolution
    v = S.add_constraint(spark, t, "k_nonneg", "k >= 0")
    man = S.read_manifest(t, v)
    assert man.get("schema") is not None
    assert [f["name"] for f in man["schema"]["fields"]] == ["k", "tag"]
    got = S.read(spark, t, v)
    assert got.schema.fieldNames() == ["k", "tag"]
    assert got.filter("tag IS NULL").count() == 5  # null-fill intact


def test_declared_spec_set_carry_and_clear(spark, tmp_path):
    # the ACTIVE spec is versioned table metadata: set as a
    # metadata-only commit, carried by every later commit type,
    # cleared by an explicit tombstone (r12 partition evolution)
    t = _t(spark, tmp_path)
    assert S.active_partition_spec(t) is None
    v = S.set_partition_spec(t, ("bucket", "k", 8))
    assert S.active_partition_spec(t) == ("bucket", "k", 8)
    man = S.read_manifest(t, v)
    assert man["operation"] == "set-partition-spec"
    assert man.get("schema") is not None  # metadata commit keeps schema
    # carried through a data commit and a constraint commit
    S.append(spark.createDataFrame([(50, 5)], "k long, v long"), t)
    S.add_constraint(spark, t, "k_pos", "k >= 0")
    assert S.active_partition_spec(t) == ("bucket", "k", 8)
    # identity and month forms round-trip too
    S.set_partition_spec(t, "k")
    assert S.active_partition_spec(t) == "k"
    # explicit clear; later commits stay cleared
    S.set_partition_spec(t, None)
    assert S.active_partition_spec(t) is None
    S.append(spark.createDataFrame([(51, 5)], "k long, v long"), t)
    assert S.active_partition_spec(t) is None
    # time travel reads the spec of its era
    assert S.active_partition_spec(t, version=v) == ("bucket", "k", 8)


def test_current_spec_writer_follows_evolution(spark, tmp_path):
    # append(partition_by=CURRENT_SPEC) resolves the declared spec at
    # write time: files land under whatever the table declares, and a
    # spec evolution re-routes NEW commits without touching old files
    t = os.path.join(str(tmp_path), "cs")
    rows = spark.range(0, 300).select(F.col("id").alias("k"),
                                      (F.col("id") * 2).alias("v"))
    S.set_partition_spec(t, ("bucket", "k", 4))  # declared before data
    S.append(rows.filter("k < 150"), t, n_files=1,
             partition_by=S.CURRENT_SPEC)
    S.set_partition_spec(t, ("bucket", "k", 8))
    S.append(rows.filter("k >= 150"), t, n_files=1,
             partition_by=S.CURRENT_SPEC)
    man = S.read_manifest(t, S.versions(t)[-1])
    by_seq = {}
    for e in man["files"]:
        by_seq.setdefault(e["seq"], set()).add(
            (e.get("partition_spec") or {}).get("param"))
    assert by_seq[2] == {4} and by_seq[4] == {8}
    # the point lookup prunes each generation under its own transform
    got = S.read(spark, t, key_in=("k", [10, 200]))
    assert sorted(r.k for r in got.filter("k IN (10, 200)").collect()) \
        == [10, 200]
    assert got.select(F.input_file_name()).distinct().count() <= 4
    # CURRENT_SPEC with no declaration ever made writes unpartitioned
    t2 = os.path.join(str(tmp_path), "cs2")
    S.append(rows.limit(5), t2, n_files=1, partition_by=S.CURRENT_SPEC)
    m2 = S.read_manifest(t2, 1)
    assert all("partition" not in e for e in m2["files"])


def test_spec_commit_is_cdc_silent(spark, tmp_path):
    # set-partition-spec is metadata-only: the row-CDC feed emits zero
    # rows for it and downstream subscribers never wake
    t = _t(spark, tmp_path)
    v = S.set_partition_spec(t, ("truncate", "k", 100))
    ch = S.read_row_changes(spark, t, v - 1, v)
    assert ch.count() == 0


def test_declared_spec_survives_every_commit_type(spark, tmp_path):
    # the active spec is carried by hand-built manifests too (merge
    # COW/MOR, delete COW/MOR, optimize, stream-append) — the same
    # carry contract as constraints (r12 session-3 fix)
    t = _t(spark, tmp_path)
    S.set_partition_spec(t, ("bucket", "k", 4))
    S.merge(spark.createDataFrame([(3, 33)], "k long, v long"), t,
            key="k")
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    S.merge(spark.createDataFrame([(4, 44)], "k long, v long"), t,
            key="k", mode="merge-on-read")
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    S.compact(spark, t, n_files=1)
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    S.delete(spark.createDataFrame([(4,)], "k long"), t, key="k",
             mode="merge-on-read")
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    S.compact(spark, t, n_files=1)
    S.delete(spark.createDataFrame([(3,)], "k long"), t, key="k")
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    S.optimize(spark, t, small_file_rows=1000)
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    S.append_stream_batch(
        spark.createDataFrame([(60, 6)], "k long, v long"), t, batch_id=0)
    assert S.active_partition_spec(t) == ("bucket", "k", 4)
    # rollback restores the spec OF THAT ERA (full-state contract)
    S.rollback(t, 1)
    assert S.active_partition_spec(t) is None


def test_merge_and_delete_rewrites_keep_declared_layout(spark, tmp_path):
    # an upsert-maintained table with a declared spec keeps its layout:
    # merge/delete rewrites land partitioned under the active spec
    # instead of shedding partition metadata file by file (r12)
    t = os.path.join(str(tmp_path), "mspec")
    rows = spark.range(0, 200).select(F.col("id").alias("k"),
                                      (F.col("id") * 2).alias("v"))
    S.set_partition_spec(t, ("bucket", "k", 4))
    S.append(rows, t, n_files=1, partition_by=S.CURRENT_SPEC)
    S.merge(spark.createDataFrame([(10, -1), (500, -2)], "k long, v long"),
            t, key="k")
    m = S.read_manifest(t, S.versions(t)[-1])
    assert all(
        (e.get("partition_spec") or {}).get("param") == 4
        for e in m["files"]
    )
    S.delete(spark.createDataFrame([(11,)], "k long"), t, key="k")
    m = S.read_manifest(t, S.versions(t)[-1])
    assert all(
        (e.get("partition_spec") or {}).get("param") == 4
        for e in m["files"]
    )
    got = S.read(spark, t, key_in=("k", [10, 500, 11, 12]))
    vals = sorted((r.k, r.v) for r in
                  got.filter("k IN (10, 500, 11, 12)").collect())
    assert vals == [(10, -1), (12, 24), (500, -2)]


def test_stream_appends_follow_declared_layout(spark, tmp_path):
    # streamed batches land under the active spec too (every write
    # path honors the declared layout)
    t = os.path.join(str(tmp_path), "sspec")
    S.set_partition_spec(t, ("bucket", "k", 4))
    for b in range(2):
        S.append_stream_batch(
            spark.range(b * 50, b * 50 + 50).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
            t, batch_id=b)
    m = S.read_manifest(t, S.versions(t)[-1])
    assert m["files"] and all(
        (e.get("partition_spec") or {}).get("param") == 4
        for e in m["files"]
    )
    got = S.read(spark, t, key_in=("k", [7, 77]))
    assert sorted(r.k for r in got.filter("k IN (7, 77)").collect()) \
        == [7, 77]


def test_rename_column_reads_across_eras(spark, tmp_path):
    # rename is metadata-only: files written BEFORE the rename store
    # the old footer name, and every read maps them per-era (r12)
    t = os.path.join(str(tmp_path), "ren")
    S.overwrite(spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        t, n_files=2)
    v_ren = S.rename_column(t, "v", "val")
    m = S.read_manifest(t, v_ren)
    assert m["operation"] == "rename-column"
    assert [f["name"] for f in m["schema"]["fields"]] == ["k", "val"]
    assert m["renames"] == [{"old": "v", "new": "val", "v": v_ren}]
    got = S.read(spark, t)
    assert got.columns == ["k", "val"]
    # values intact — a naive schema-swap would null-fill old files
    assert got.agg(F.sum("val")).collect()[0][0] == sum(
        2 * k for k in range(100))
    # post-rename append mixes eras in one table
    S.append(spark.createDataFrame([(200, 999)], "k long, val long"), t,
             n_files=1)
    got = S.read(spark, t)
    assert got.filter("k = 200").collect()[0]["val"] == 999
    assert got.count() == 101
    # a merge REWRITE reads pre-rename files correctly (value-bearing)
    S.merge(spark.createDataFrame([(3, -3)], "k long, val long"), t,
            key="k")
    got = {r.k: r.val for r in S.read(spark, t).collect()}
    assert got[3] == -3 and got[4] == 8 and got[200] == 999
    # chained second rename: two-era undo
    S.rename_column(t, "val", "value")
    got = S.read(spark, t)
    assert got.columns == ["k", "value"]
    assert got.filter("k = 4").collect()[0]["value"] == 8
    # time travel reads each era under ITS name
    assert S.read(spark, t, 1).columns == ["k", "v"]
    # rollback to the pre-rename version restores the old schema
    S.rollback(t, 1)
    assert S.read(spark, t).columns == ["k", "v"]


def test_rename_column_refusals(spark, tmp_path):
    t = _t(spark, tmp_path)  # columns k, v
    with pytest.raises(ValueError, match="no column"):
        S.rename_column(t, "zzz", "y")
    with pytest.raises(ValueError, match="already exists"):
        S.rename_column(t, "v", "k")
    S.add_constraint(spark, t, "v_ok", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        S.rename_column(t, "v", "val")
    S.drop_constraint(t, "v_ok")
    S.delete(spark.createDataFrame([(1,)], "k long"), t, key="k",
             mode="merge-on-read")
    with pytest.raises(ValueError, match="pending"):
        S.rename_column(t, "v", "val")
    S.purge_deletes(spark, t)
    S.create_branch(t, "b1")
    with pytest.raises(ValueError, match="branch"):
        S.rename_column(t, "v", "val")
    S.discard_branch(t, "b1")
    S.rename_column(t, "v", "val")  # now clean: succeeds
    assert S.read(spark, t).columns == ["k", "val"]
    # partition-source columns refuse
    t2 = os.path.join(str(tmp_path), "renp")
    S.overwrite(spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")),
        t2, n_files=1, partition_by=("bucket", "k", 4))
    with pytest.raises(ValueError, match="partition"):
        S.rename_column(t2, "k", "kk")


def test_rename_column_cdc_contract(spark, tmp_path):
    # the batch feed serves windows wholly before/after a rename and
    # refuses spanning windows; the stream readers refuse entirely
    t = os.path.join(str(tmp_path), "rencdc")
    S.overwrite(spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        t, n_files=1)
    S.merge(spark.createDataFrame([(1, -1)], "k long, v long"), t,
            key="k")                                            # v2
    S.rename_column(t, "v", "val")                              # v3
    S.merge(spark.createDataFrame([(2, -2)], "k long, val long"), t,
            key="k")                                            # v4
    before = S.read_row_changes(spark, t, 1, 2)
    assert "v" in before.columns
    assert before.filter("_change_type = 'update_postimage'"
                         ).collect()[0]["v"] == -1
    after = S.read_row_changes(spark, t, 3, 4)
    assert "val" in after.columns
    # the post-rename merge rewrote PRE-rename files: its pre-images
    # must come back under the current name with true values
    pre = {r.k: r.val for r in after.filter(
        "_change_type = 'update_preimage'").collect()}
    assert pre == {2: 4}
    with pytest.raises(ValueError, match="rename"):
        S.read_row_changes(spark, t, 1, 4)
    # the rename commit alone is a zero-row window... spanning refusal
    # applies to (2, 3] too since the event sits at v3
    with pytest.raises(ValueError, match="rename"):
        S.read_row_changes(spark, t, 2, 3)


def test_add_column_with_initial_default(spark, tmp_path):
    # files written BEFORE the add read the declared default (not
    # null); files after keep genuine values including real nulls (r12)
    t = _t(spark, tmp_path)  # 10 rows (k, v), v1
    S.add_column(t, "tier", "string", default="legacy")
    got = S.read(spark, t)
    assert got.columns == ["k", "v", "tier"]
    assert got.filter("tier = 'legacy'").count() == 10
    S.append(spark.createDataFrame(
        [(100, 0, "gold"), (101, 0, None)],
        "k long, v long, tier string"), t, n_files=1)
    got = S.read(spark, t)
    assert got.filter("tier = 'legacy'").count() == 10
    assert got.filter("tier = 'gold'").count() == 1
    assert got.filter("tier IS NULL").count() == 1  # genuine null kept
    # classic add-column (no default): pre-evolution files read null
    S.add_column(t, "score", "long")
    got = S.read(spark, t)
    assert got.filter("score IS NULL").count() == 12
    # a rewrite MATERIALIZES the default at its new sequence number
    S.merge(spark.createDataFrame([(1, -1, "vip", 5)],
                                  "k long, v long, tier string, "
                                  "score long"), t, key="k")
    got = {r.k: (r.tier, r.score) for r in S.read(spark, t).collect()}
    assert got[1] == ("vip", 5)
    assert got[2] == ("legacy", None)  # untouched old-era rows intact
    # time travel before the add: old schema, no phantom column
    assert S.read(spark, t, 1).columns == ["k", "v"]
    # duplicate add refuses
    with pytest.raises(ValueError, match="already exists"):
        S.add_column(t, "tier", "string")


def test_default_follows_rename(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.add_column(t, "tier", "string", default="legacy")
    S.rename_column(t, "tier", "grade")
    got = S.read(spark, t)
    assert got.columns == ["k", "v", "grade"]
    assert got.filter("grade = 'legacy'").count() == 10


def test_drop_column_metadata_only(spark, tmp_path):
    t = _t(spark, tmp_path)  # (k, v)
    S.drop_column(t, "v")
    got = S.read(spark, t)
    assert got.columns == ["k"] and got.count() == 10
    # time travel still sees the dropped column in its era
    assert S.read(spark, t, 1).columns == ["k", "v"]
    # appends no longer need (or accept implicit revival of) the name
    S.append(spark.createDataFrame([(50,)], "k long"), t, n_files=1)
    assert S.read(spark, t).columns == ["k"]
    with pytest.raises(ValueError, match="cannot drop the last"):
        S.drop_column(t, "k")
    with pytest.raises(ValueError, match="no column"):
        S.drop_column(t, "zzz")


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    # the resurrection hazard: old files still STORE the dropped
    # column's bytes; re-adding the name must read the new default,
    # never the stale values (r12 drop/re-add handshake)
    t = _t(spark, tmp_path)  # v holds k*10
    S.drop_column(t, "v")
    # implicit revival via append refuses loudly
    with pytest.raises(ValueError, match="previously DROPPED"):
        S.append(spark.createDataFrame([(60, 1)], "k long, v long"), t)
    # the blessed path: add_column masks stale bytes with the default
    S.add_column(t, "v", "long", default=-1)
    got = {r.k: r.v for r in S.read(spark, t).collect()}
    assert set(got.values()) == {-1}  # never k*10
    # post-re-add writes carry genuine values
    S.append(spark.createDataFrame([(70, 7)], "k long, v long"), t,
             n_files=1)
    got = {r.k: r.v for r in S.read(spark, t).collect()}
    assert got[70] == 7 and got[0] == -1
    # re-add with NO default masks with null, same protection
    t2 = os.path.join(str(tmp_path), "d2")
    S.overwrite(spark.createDataFrame([(1, 11)], "k long, w long"), t2,
                n_files=1)
    S.drop_column(t2, "w")
    S.add_column(t2, "w", "long")
    assert S.read(spark, t2).collect()[0]["w"] is None


def test_drop_column_refusals(spark, tmp_path):
    t = _t(spark, tmp_path)
    S.add_constraint(spark, t, "v_ok", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        S.drop_column(t, "v")
    S.drop_constraint(t, "v_ok")
    S.create_branch(t, "b")
    with pytest.raises(ValueError, match="branch"):
        S.drop_column(t, "v")
    S.discard_branch(t, "b")
    t2 = os.path.join(str(tmp_path), "dp")
    S.overwrite(spark.range(10).select(F.col("id").alias("k"),
                                       (F.col("id") % 2).alias("p")),
                t2, n_files=1, partition_by="p")
    with pytest.raises(ValueError, match="partition"):
        S.drop_column(t2, "p")

"""merge(evolve_schema=True) (r12): one-commit schema evolution +
upsert, both modes; plus byte-threshold bin-pack OPTIMIZE and the
``bytes`` files_table column that drives it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _tbl(tmp_path, name):
    return str(tmp_path / name)


def _kv(spark, n=100):
    return spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )


def _src(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(99).cast("long").alias("v"),
        F.lit("gold").alias("grade"),
    )


def test_default_still_refuses_extra_columns(spark, tmp_path):
    t = _tbl(tmp_path, "d1")
    S.overwrite(_kv(spark), t, n_files=1)
    with pytest.raises(ValueError, match="evolve_schema=True"):
        S.merge(_src(spark, 0, 5), t, key="k")


def test_cow_evolve_upserts_and_nullfills(spark, tmp_path):
    t = _tbl(tmp_path, "d2")
    S.overwrite(_kv(spark), t, n_files=2)
    v = S.merge(_src(spark, 0, 5), t, key="k", evolve_schema=True)
    assert v == 2
    out = S.read(spark, t)
    assert out.columns == ["k", "v", "grade"]
    rows = {r.k: (r.v, r.grade) for r in out.collect()}
    assert len(rows) == 100
    assert rows[2] == (99, "gold")
    assert rows[50] == (0, None)  # carried row null-fills
    # time travel: v1 keeps the old two-column schema
    assert S.read(spark, t, 1).columns == ["k", "v"]


def test_mor_evolve_zero_rewrite(spark, tmp_path):
    t = _tbl(tmp_path, "d3")
    S.overwrite(_kv(spark), t, n_files=2)
    v = S.merge(_src(spark, 95, 105), t, key="k",
                mode="merge-on-read", evolve_schema=True)
    m1, m2 = S.read_manifest(t, 1), S.read_manifest(t, v)
    assert {e["path"] for e in m1["files"]} <= {
        e["path"] for e in m2["files"]
    }  # zero rewrite: old files carried
    rows = {r.k: (r.v, r.grade) for r in S.read(spark, t).collect()}
    assert len(rows) == 105
    assert rows[97] == (99, "gold") and rows[10] == (0, None)


def test_evolve_refuses_dropped_name_revival(spark, tmp_path):
    t = _tbl(tmp_path, "d4")
    S.overwrite(_kv(spark), t, n_files=1)
    S.merge(_src(spark, 0, 5), t, key="k", evolve_schema=True)
    S.compact(spark, t, n_files=1)
    S.drop_column(t, "grade")
    with pytest.raises(ValueError, match="DROPPED"):
        S.merge(_src(spark, 0, 5), t, key="k", evolve_schema=True)


def test_evolve_type_conflict_still_loud(spark, tmp_path):
    t = _tbl(tmp_path, "d5")
    S.overwrite(_kv(spark), t, n_files=1)
    bad = spark.range(5).select(
        F.col("id").alias("k"), F.lit("x").alias("v")  # v: long -> string
    )
    with pytest.raises(ValueError, match="conflict on column 'v'"):
        S.merge(bad, t, key="k", evolve_schema=True)


def test_files_table_bytes_and_byte_binpack(spark, tmp_path):
    t = _tbl(tmp_path, "d6")
    S.overwrite(spark.range(0, 20000).select(F.col("id").alias("k")),
                t, n_files=1)
    for i in range(3):
        S.append(spark.range(i * 10, i * 10 + 10).select(
            F.col("id").alias("k")), t, n_files=1)
    sizes = [r.bytes for r in S.files_table(spark, t).collect()]
    assert all(b and b > 0 for b in sizes)
    thr = max(sizes)  # everything but the big file is "small"
    v = S.optimize(spark, t, small_file_rows=10**9,
                   small_file_bytes=thr)
    m = S.read_manifest(t, v)
    assert len(m["files"]) == 2  # big carried + one packed file
    assert m["files"][0].get("bytes") or m["files"][1].get("bytes")
    assert S.read(spark, t).count() == 20030
    # target_bytes sizes the output count from the small set's bytes
    t2 = _tbl(tmp_path, "d7")
    S.overwrite(spark.range(0, 100).select(F.col("id").alias("k")),
                t2, n_files=4)
    small_b = sum(r.bytes for r in S.files_table(spark, t2).collect())
    v2 = S.optimize(spark, t2, small_file_rows=10**9,
                    small_file_bytes=10**9,
                    target_bytes=max(1, small_b // 2))
    assert v2 is not None
    assert len(S.read_manifest(t2, v2)["files"]) == 2


def test_maintain_passes_byte_thresholds(spark, tmp_path):
    t = str(tmp_path / "mb")
    S.overwrite(spark.range(0, 20000).select(F.col("id").alias("k")),
                t, n_files=1)
    for i in range(3):
        S.append(spark.range(i, i + 5).select(F.col("id").alias("k")),
                 t, n_files=1)
    thr = max(r.bytes for r in S.files_table(spark, t).collect())
    report = S.maintain(spark, t, small_file_rows=10**9,
                        small_file_bytes=thr)
    assert [r["action"] for r in report] == ["optimize"]
    assert len(S.read_manifest(t, S.versions(t)[-1])["files"]) == 2

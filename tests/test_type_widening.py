"""Metadata-only type widening (snapshots.widen_column, r12):
int→long / short→int/long / float→double as one manifest link, with
per-file-era stored-type reads, the compact retirement handshake, and
the lossless-only whitelist."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _tbl(tmp_path, name):
    return str(tmp_path / name)


def _base(spark):
    return spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"),
    )


def test_widen_is_metadata_only_and_reads_back_wide(spark, tmp_path):
    t = _tbl(tmp_path, "w1")
    S.overwrite(_base(spark), t, n_files=2)
    v = S.widen_column(t, "k", "long")
    assert v == 2
    m1, m2 = S.read_manifest(t, 1), S.read_manifest(t, 2)
    assert [e["path"] for e in m2["files"]] == [
        e["path"] for e in m1["files"]
    ]
    out = S.read(spark, t)
    assert dict(out.dtypes)["k"] == "bigint"
    assert out.agg(F.sum("k")).collect()[0][0] == 4950
    # time travel reads v1 under its own (narrow) schema
    assert dict(S.read(spark, t, 1).dtypes)["k"] == "int"


def test_beyond_int32_appends_after_widen(spark, tmp_path):
    t = _tbl(tmp_path, "w2")
    S.overwrite(_base(spark), t, n_files=1)
    S.widen_column(t, "k", "long")
    S.append(
        spark.createDataFrame([(2**40, 7)], "k long, v int"), t, n_files=1
    )
    got = S.read(spark, t).agg(F.sum("k"), F.count("*")).collect()[0]
    assert got[0] == 4950 + 2**40 and got[1] == 101
    # old-era file (int32 storage) and new-era file (int64) coexist
    # under one manifest type; merge still stats-prunes correctly
    S.merge(spark.createDataFrame([(3, -1)], "k long, v int"), t, key="k")
    vals = {r.k: r.v for r in S.read(spark, t).collect()}
    assert vals[3] == -1 and vals[2**40] == 7


def test_narrower_writer_refused_after_widen(spark, tmp_path):
    t = _tbl(tmp_path, "w3")
    S.overwrite(_base(spark), t, n_files=1)
    S.widen_column(t, "k", "long")
    with pytest.raises(ValueError, match="conflict on column 'k'"):
        S.append(spark.createDataFrame([(7, 7)], "k int, v int"), t)


def test_lossy_and_unknown_promotions_refused(spark, tmp_path):
    t = _tbl(tmp_path, "w4")
    S.overwrite(_base(spark), t, n_files=1)
    with pytest.raises(ValueError, match="lossless"):
        S.widen_column(t, "k", "double")
    with pytest.raises(ValueError, match="lossless"):
        S.widen_column(t, "k", "string")
    with pytest.raises(ValueError, match="already"):
        S.widen_column(t, "k", "integer")
    with pytest.raises(ValueError, match="no column"):
        S.widen_column(t, "zzz", "long")


def test_float_to_double_is_bit_exact(spark, tmp_path):
    t = _tbl(tmp_path, "w5")
    df = spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id").cast("float") / 8).cast("float").alias("x"),
    )
    S.overwrite(df, t, n_files=1)
    S.widen_column(t, "x", "double")
    out = S.read(spark, t)
    assert dict(out.dtypes)["x"] == "double"
    # /8 is exact in binary: the up-cast loses nothing
    assert out.agg(F.sum("x")).collect()[0][0] == sum(i / 8 for i in range(50))


def test_compact_retires_widen_history_and_reenables_rename(
        spark, tmp_path):
    t = _tbl(tmp_path, "w6")
    S.overwrite(_base(spark), t, n_files=1)
    S.widen_column(t, "k", "long")
    with pytest.raises(ValueError, match="widening history"):
        S.rename_column(t, "k", "kk")
    with pytest.raises(ValueError, match="widening history"):
        S.drop_column(t, "k")
    S.compact(spark, t, n_files=1)
    assert not S.read_manifest(t, S.versions(t)[-1]).get("widens")
    S.rename_column(t, "k", "kk")
    out = S.read(spark, t)
    assert dict(out.dtypes)["kk"] == "bigint"
    assert out.agg(F.sum("kk")).collect()[0][0] == 4950


def test_widen_on_renamed_column_refused(spark, tmp_path):
    t = _tbl(tmp_path, "w7")
    S.overwrite(_base(spark), t, n_files=1)
    S.rename_column(t, "k", "kk")
    with pytest.raises(ValueError, match="rename history"):
        S.widen_column(t, "kk", "long")


def test_cdc_is_silent_across_widen(spark, tmp_path):
    t = _tbl(tmp_path, "w8")
    S.overwrite(_base(spark), t, n_files=1)
    S.widen_column(t, "k", "long")
    assert S.read_row_changes(spark, t, 1, 2).count() == 0


def test_chained_widen_short_int_long(spark, tmp_path):
    t = _tbl(tmp_path, "w9")
    df = spark.range(0, 10).select(
        F.col("id").cast("short").alias("k"),
        F.col("id").alias("v"),
    )
    S.overwrite(df, t, n_files=1)          # era stores short
    S.widen_column(t, "k", "integer")
    S.append(
        spark.range(10, 20).select(
            F.col("id").cast("int").alias("k"), F.col("id").alias("v")
        ), t, n_files=1,
    )                                      # era stores int
    S.widen_column(t, "k", "long")
    S.append(
        spark.range(20, 30).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ), t, n_files=1,
    )                                      # era stores long
    out = S.read(spark, t)
    assert dict(out.dtypes)["k"] == "bigint"
    assert sorted(r.k for r in out.collect()) == list(range(30))

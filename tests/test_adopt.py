"""In-place parquet adoption (snapshots.adopt_parquet, r12): external
files join the ledger by reference — footer-stats metadata commit,
zero data moved, vacuum-safe, gradually internalized by rewrites."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


@pytest.fixture()
def ext_dir(spark, tmp_path):
    ext = str(tmp_path / "ext")
    (spark.range(0, 1000)
     .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
     .repartitionByRange(4, "k").sortWithinPartitions("k")
     .write.parquet(ext))
    return ext


def test_adopt_is_metadata_only_with_footer_stats(spark, tmp_path,
                                                  ext_dir):
    t = str(tmp_path / "t")
    v = S.adopt_parquet(spark, t, ext_dir)
    assert v == 1
    m = S.read_manifest(t, 1)
    assert all(e["external"] for e in m["files"])
    assert all(e["path"].startswith(os.sep) for e in m["files"])
    assert all(e["stats"].get("min_k") is not None for e in m["files"])
    assert all(e.get("bytes", 0) > 0 for e in m["files"])
    out = S.read(spark, t)
    assert out.count() == 1000
    assert out.agg(F.sum("v")).collect()[0][0] == 999000


def test_footer_stats_drive_pruning(spark, tmp_path, ext_dir):
    t = str(tmp_path / "t")
    S.adopt_parquet(spark, t, ext_dir)
    rep: dict = {}
    got = S.read(spark, t, prune=("k", 0, 10), report=rep)
    assert rep["files_scanned"] == 1 and rep["files_total"] == 4
    assert got.filter("k <= 10").count() == 11


def test_rewrites_internalize_without_touching_source(spark, tmp_path,
                                                      ext_dir):
    t = str(tmp_path / "t")
    S.adopt_parquet(spark, t, ext_dir)
    before = sorted(os.listdir(ext_dir))
    S.merge(spark.createDataFrame([(3, -1)], "k long, v long"), t,
            key="k")
    m = S.read_manifest(t, 2)
    ext_left = [e for e in m["files"] if e.get("external")]
    assert 0 < len(ext_left) < 4  # only the touched file internalized
    assert sorted(os.listdir(ext_dir)) == before
    got = {r.k: r.v for r in S.read(spark, t).collect()}
    assert got[3] == -1 and len(got) == 1000
    S.compact(spark, t, n_files=2)
    assert not any(e.get("external")
                   for e in S.read_manifest(t, 3)["files"])
    assert sorted(os.listdir(ext_dir)) == before


def test_vacuum_never_reclaims_external_files(spark, tmp_path, ext_dir):
    t = str(tmp_path / "t")
    S.adopt_parquet(spark, t, ext_dir)
    before = sorted(os.listdir(ext_dir))
    S.compact(spark, t, n_files=1)
    S.vacuum(t, keep_versions=1)
    assert sorted(os.listdir(ext_dir)) == before
    assert S.read(spark, t).count() == 1000


def test_positional_ops_refuse_external_files(spark, tmp_path, ext_dir):
    t = str(tmp_path / "t")
    S.adopt_parquet(spark, t, ext_dir)
    with pytest.raises(ValueError, match="ADOPTED"):
        S.delete_where(spark, t, "v = 4")
    with pytest.raises(ValueError, match="ADOPTED"):
        S.update_where(spark, t, "v = 4", {"v": "0"})
    S.compact(spark, t, n_files=1)
    S.delete_where(spark, t, "v = 4")
    assert S.read(spark, t).count() == 999


def test_adopt_composes_with_existing_table(spark, tmp_path, ext_dir):
    t = str(tmp_path / "t")
    S.overwrite(
        spark.range(5000, 5010).select(
            F.col("id").alias("k"), F.lit(0).cast("long").alias("v")),
        t, n_files=1)
    v = S.adopt_parquet(spark, t, ext_dir)
    assert v == 2
    assert S.read(spark, t).count() == 1010
    # equality MOR delete works over adopted files (no coordinates)
    S.delete(spark.range(0, 10).select(F.col("id").alias("k")), t,
             key="k", mode="merge-on-read")
    assert S.read(spark, t).count() == 1000


def test_adopt_explicit_file_list_and_empty_refusal(spark, tmp_path,
                                                    ext_dir):
    t = str(tmp_path / "t")
    files = sorted(
        os.path.join(ext_dir, f) for f in os.listdir(ext_dir)
        if f.endswith(".parquet")
    )[:2]
    S.adopt_parquet(spark, t, files)
    assert len(S.read_manifest(t, 1)["files"]) == 2
    with pytest.raises(ValueError, match="no parquet files"):
        S.adopt_parquet(spark, str(tmp_path / "t2"),
                        str(tmp_path / "nothing"))

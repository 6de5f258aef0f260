"""Z-order clustering + multi-range manifest pruning (sources/
snapshots.py: compact(zorder_by=), read(prune=[...])).

Pins: the clustering rewrite is a logical no-op, a 2-D box and a
second-dimension-only range both prune files where LINEAR clustering
keeps everything, multi-range pruning is sound (never loses a row),
and the API guards (>= 2 numeric columns, mutual exclusion with
cluster_by/partition_by) fail loudly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S


def _rows(spark, n=20000):
    # a and b are INDEPENDENT: linear clustering on a scatters b
    return spark.range(0, n).select(
        (F.col("id") % 141).alias("a"),
        ((F.col("id") * 7919) % 10007).alias("b"),
        F.col("id").alias("k"),
    )


def _files(df) -> int:
    return df.select(F.input_file_name()).distinct().count()


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zorder"))
    lin, z = os.path.join(d, "lin"), os.path.join(d, "z")
    rows = _rows(spark)
    S.overwrite(rows, lin, n_files=1)
    S.compact(spark, lin, n_files=16, cluster_by=["a"])
    S.overwrite(rows, z, n_files=1)
    S.compact(spark, z, n_files=16, zorder_by=["a", "b"])
    return lin, z


def test_zorder_compact_is_a_logical_noop(spark, tables):
    _lin, z = tables
    got = sorted(r.k for r in S.read(spark, z).collect())
    assert got == list(range(20000))


def test_box_prunes_zorder_not_linear(spark, tables):
    lin, z = tables
    box = [("a", 10, 40), ("b", 1000, 2500)]
    z_kept, lin_kept = (_files(S.read(spark, t, prune=box))
                        for t in (z, lin))
    # zorder intersects BOTH dims so it can never do worse than the
    # linear layout's a-slice on this box — and must genuinely prune.
    # (strictly-fewer is boundary-dependent: repartitionByRange samples
    # its range bounds, so the two layouts' file edges jitter run to
    # run; the strict b-dimension discrimination is pinned separately
    # in test_second_dim_alone_prunes_zorder_only)
    assert z_kept <= lin_kept
    assert z_kept < 16


def test_second_dim_alone_prunes_zorder_only(spark, tables):
    lin, z = tables
    rng = ("b", 1000, 1500)
    assert _files(S.read(spark, lin, prune=rng)) == 16  # b scattered
    assert _files(S.read(spark, z, prune=rng)) < 16


def test_multi_range_prune_is_sound(spark, tables):
    _lin, z = tables
    box = [("a", 10, 40), ("b", 1000, 2500)]
    pruned = S.read(spark, z, prune=box).filter(
        "a BETWEEN 10 AND 40 AND b BETWEEN 1000 AND 2500"
    )
    full = S.read(spark, z).filter(
        "a BETWEEN 10 AND 40 AND b BETWEEN 1000 AND 2500"
    )
    assert sorted(r.k for r in pruned.collect()) \
        == sorted(r.k for r in full.collect())


def test_zorder_guards(spark, tmp_path):
    t = os.path.join(str(tmp_path), "g")
    S.overwrite(_rows(spark, 100), t, n_files=1)
    with pytest.raises(ValueError, match="at least 2"):
        S.compact(spark, t, n_files=2, zorder_by=["a"])
    with pytest.raises(ValueError, match="at most one"):
        S.compact(spark, t, n_files=2, zorder_by=["a", "b"],
                  cluster_by=["a"])
    rows = spark.createDataFrame([(1, "x")], "a long, s string")
    t2 = os.path.join(str(tmp_path), "g2")
    S.overwrite(rows, t2, n_files=1)
    with pytest.raises(ValueError, match="non-numeric"):
        S.compact(spark, t2, n_files=2, zorder_by=["a", "s"])


def test_zorder_three_dims(spark, tmp_path):
    t = os.path.join(str(tmp_path), "z3")
    rows = spark.range(0, 5000).select(
        (F.col("id") % 50).alias("a"),
        ((F.col("id") * 7919) % 997).alias("b"),
        ((F.col("id") * 104729) % 4999).alias("c"),
    )
    S.overwrite(rows, t, n_files=1)
    S.compact(spark, t, n_files=8, zorder_by=["a", "b", "c"])
    assert S.read(spark, t).count() == 5000
    # every single dimension prunes something on a tight range
    for col, lo, hi in (("a", 0, 5), ("b", 0, 99), ("c", 0, 499)):
        assert _files(S.read(spark, t, prune=(col, lo, hi))) < 8


def test_zorder_all_null_columns_degrades_gracefully(spark, tmp_path):
    # ADVICE r11 low: terms[0] raised IndexError when every z-order
    # column was entirely null — must degrade to an unclustered
    # rewrite, not crash
    t = os.path.join(str(tmp_path), "allnull")
    rows = spark.range(20).select(
        F.col("id").alias("k"),
        F.lit(None).cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
    )
    S.overwrite(rows, t, n_files=1)
    v = S.compact(spark, t, n_files=2, zorder_by=["a", "b"])
    assert S.read(spark, t, v).count() == 20

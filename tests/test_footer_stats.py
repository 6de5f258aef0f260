"""Footer-derived manifest stats (r12 optimization) must be EXACTLY the
stats the engine agg job used to compute — manifest stats are hash-load-
bearing (stats pruning decides ``files_scanned`` audit values), so the
fast path may only fire where footer == engine semantics is provable,
and everything else must fall back to the grouped-agg job.

Ground truth here is the PRE-optimization implementation: one Spark job
grouping by ``input_file_name()`` over the committed files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as SN


def _engine_stats(spark, table_path: str, version: int) -> dict[str, dict]:
    """The old implementation's answer: per committed file, the engine's
    own count/min/max over every stat-typed column."""
    m = SN.read_manifest(table_path, version)
    out = {}
    for e in m["files"]:
        path = os.path.join(table_path, e["path"])
        df = spark.read.parquet(path)
        stat_cols = [
            f.name for f in df.schema.fields
            if f.dataType.typeName() in SN._NUMERIC_TYPES + ("string",)
        ]
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in stat_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        row = df.agg(*aggs).collect()[0].asDict()
        n = row.pop("_n")
        out[e["path"]] = {
            "rows": n,
            # a 0-row part file never formed an input_file_name() group
            # under the engine path: rows 0, stats {}
            "stats": ({k: SN._stat_value(v) for k, v in row.items()}
                      if n else {}),
        }
    return out


def _same(a, b) -> bool:
    # NaN-aware scalar equality (NaN != NaN under ==, but the stat is
    # "the same" when both paths yield NaN) — plus exact type equality
    # so 1 (int) never passes for 1.0 (float)
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or a == b
    return type(a) is type(b) and a == b


def _assert_manifest_matches_engine(spark, t: str, v: int) -> None:
    truth = _engine_stats(spark, t, v)
    m = SN.read_manifest(t, v)
    assert len(m["files"]) == len(truth)
    for e in m["files"]:
        want = truth[e["path"]]
        assert e["rows"] == want["rows"], e["path"]
        assert set(e["stats"]) == set(want["stats"]), (
            f"{e['path']}: stat keys {sorted(e['stats'])} != "
            f"{sorted(want['stats'])}"
        )
        for k, w in want["stats"].items():
            g = e["stats"][k]
            assert (g is None and w is None) or (
                g is not None and w is not None and _same(g, w)
            ), (
                f"{e['path']}.{k}: footer-path stat {g!r} != engine "
                f"stat {w!r}"
            )


def test_commit_stats_match_engine_across_dtypes(spark, tmp_path):
    """Longs past 2^53, NaN doubles, ±0.0, non-ASCII and long strings,
    all-null columns, shorts, floats: every committed manifest entry
    carries exactly the stats the engine agg would have produced."""
    big = (1 << 60) + 7
    rows = [
        (1, big, 1.5, float("nan"), 0.5, "alpha", "café", "x" * 200, None, None),
        (2, -big, -2.5, 3.25, -0.0, "Omega", "zeta", "y" * 500, None, None),
        (3, 17, 0.0, 1.0, 2.25, "0banana", "éclair", "short", None, None),
        (4, 18, 9.75, -1.0, 3.5, "~tilde", "Caf", "z" * 63, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, big long, d_zero double, d_nan double, f float, "
        "s_ascii string, s_uni string, s_long string, s_null string, "
        "l_null long",
    ).withColumn("sh", F.col("id").cast("short"))
    t = str(tmp_path / "dtype_tbl")
    v = SN.append(df, t, n_files=2)
    _assert_manifest_matches_engine(spark, t, v)
    # the guards must have pushed the hazardous columns to the fallback
    files = sorted(
        os.path.join(t, e["path"])
        for e in SN.read_manifest(t, v)["files"]
    )
    by_file, unsafe = SN._footer_file_stats(
        t, [os.path.relpath(p, t) for p in files], df.schema,
        [f.name for f in df.schema.fields
         if f.dataType.typeName() in SN._NUMERIC_TYPES + ("string",)],
    )
    assert "s_long" in unsafe          # >= 64-byte bounds: truncation risk
    assert "d_nan" in unsafe or all(   # NaN either flagged or absent from
        "min_d_nan" not in g or g["min_d_nan"] is not None  # footer stats
        for g in by_file.values()
    )
    assert "d_zero" in unsafe          # ±0.0 bound: sign normalization risk


def test_commit_stats_match_engine_on_fixture_tables(spark):
    """The real fixture tables (the ledgers every snapshot query
    commits) keep byte-identical manifests under the footer path."""
    from magshield_data_pipeline_spark.sources.parquet import read_table

    for name in ("orders", "customer", "documents"):
        df = read_table(spark, "/root/testdata/sf0.001", name)
        import tempfile

        t = tempfile.mkdtemp(prefix=f"footer_stats_{name}_")
        v = SN.append(df, os.path.join(t, "tbl"), n_files=3)
        _assert_manifest_matches_engine(spark, os.path.join(t, "tbl"), v)


def test_partitioned_and_clustered_commits_match(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        (F.col("id").cast("double") / 3).alias("val"),
    )
    t1 = str(tmp_path / "part_tbl")
    v1 = SN.append(df, t1, n_files=2, partition_by="bucket")
    _assert_manifest_matches_engine(spark, t1, v1)
    t2 = str(tmp_path / "clus_tbl")
    SN.overwrite(df, t2, n_files=3)
    v2 = SN.compact(spark, t2, n_files=3, cluster_by=["id"])
    _assert_manifest_matches_engine(spark, t2, v2)


def test_empty_and_allnull_commits(spark, tmp_path):
    # more files than rows: some part files are empty or absent
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, s string"
    )
    t = str(tmp_path / "sparse_tbl")
    v = SN.append(df, t, n_files=4)
    _assert_manifest_matches_engine(spark, t, v)
    m = SN.read_manifest(t, v)
    for e in m["files"]:
        if e["rows"]:
            assert e["stats"]["min_s"] is None
            assert e["stats"]["max_s"] is None


@pytest.mark.parametrize("n_files", [1, 2])
def test_merge_and_delete_paths_match(spark, tmp_path, n_files):
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.concat(F.lit("k"), F.col("id")).alias("s"),
    )
    t = str(tmp_path / f"merge_tbl_{n_files}")
    SN.append(df, t, n_files=n_files)
    src = spark.range(50, 60).select(
        F.col("id"), F.lit(-1).cast("long").alias("v"),
        F.lit("upd").alias("s"),
    )
    v = SN.merge(src, t, "id", n_files=n_files)
    _assert_manifest_matches_engine(spark, t, v)

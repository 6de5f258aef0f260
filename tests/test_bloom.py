"""Bloom-filter file skipping on the snapshot ledger (sources/
snapshots.py: bloom_for= at write, read(key_in=) at lookup).

Pins: lookup soundness (bloom pruning never loses a present key),
pruning effectiveness where range stats are useless (hash-scattered
keys), conservative fallback for entries without a bloom, typed empty
frames on a total miss, and vacuum reclaiming sidecars with their
data files.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as S

SCRAMBLE, MOD = 2654435761, 1000000007


def _skey(i: int) -> int:
    return (i * SCRAMBLE) % MOD


def _scattered(spark, tmp_path, n=4000, n_files=8, name="t"):
    t = os.path.join(str(tmp_path), name)
    rows = spark.range(0, n).select(
        ((F.col("id") * SCRAMBLE) % MOD).alias("skey"),
        F.col("id").alias("doc_id"),
    )
    S.overwrite(rows, t, n_files=n_files, bloom_for={"skey": 1 << 16})
    return t


def test_bloom_lookup_soundness(spark, tmp_path):
    t = _scattered(spark, tmp_path)
    probes = [_skey(i) for i in range(0, 4000, 397)]
    got = sorted(
        r.doc_id
        for r in S.read(spark, t, key_in=("skey", probes))
        .filter(F.col("skey").isin(probes))
        .collect()
    )
    assert got == list(range(0, 4000, 397))


def test_bloom_prunes_where_range_stats_cannot(spark, tmp_path):
    t = _scattered(spark, tmp_path)
    probes = [_skey(i) for i in (11, 222, 333)]
    # range stats admit the probes in EVERY file (scattered keys)
    entries = S.read_manifest(t, 1)["files"]
    for e in entries:
        assert any(
            e["stats"]["min_skey"] <= v <= e["stats"]["max_skey"]
            for v in probes
        ), "fixture broke: range stats would have pruned"
    scanned = (
        S.read(spark, t, key_in=("skey", probes))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert scanned < len(entries)  # bloom did what ranges cannot


def test_entries_without_bloom_kept_conservatively(spark, tmp_path):
    t = _scattered(spark, tmp_path, n=1000, n_files=2)
    # a later append WITHOUT a bloom: its rows must still be found
    extra = spark.createDataFrame([(999999999, 777777)],
                                  "skey long, doc_id long")
    S.append(extra, t, n_files=1)
    got = S.read(spark, t, key_in=("skey", [999999999]))
    assert [r.doc_id for r in got.filter("skey = 999999999").collect()] \
        == [777777]


def test_all_null_column_gets_no_bloom_and_stays_readable(spark, tmp_path):
    t = os.path.join(str(tmp_path), "nulls")
    rows = spark.createDataFrame(
        [(None, 1), (None, 2)], "skey long, doc_id long"
    )
    S.overwrite(rows, t, n_files=1, bloom_for={"skey": 1 << 10})
    e = S.read_manifest(t, 1)["files"][0]
    assert "bloom" not in e  # nothing to index: no sidecar, no meta
    # null stats -> kept conservatively; the lookup still answers
    assert S.read(spark, t, key_in=("skey", [5])).count() == 2


def test_total_miss_returns_typed_empty_frame(spark, tmp_path):
    t = _scattered(spark, tmp_path, n=500, n_files=2)
    got = S.read(spark, t, key_in=("skey", [1, 2, 3]))
    assert got.count() == 0
    assert got.schema.simpleString() == "struct<skey:bigint,doc_id:bigint>"


def test_bloom_bits_must_be_word_aligned(spark, tmp_path):
    t = os.path.join(str(tmp_path), "bad")
    rows = spark.range(3).select(F.col("id").alias("skey"))
    try:
        S.overwrite(rows, t, n_files=1, bloom_for={"skey": 100})
        assert False, "expected ValueError"
    except ValueError as e:
        assert "multiple" in str(e)


def test_vacuum_reclaims_bloom_sidecars_with_their_files(spark, tmp_path):
    t = _scattered(spark, tmp_path, n=200, n_files=1)
    old = S.read_manifest(t, 1)["files"][0]["bloom"]["skey"]["path"]
    assert os.path.exists(os.path.join(t, old))
    S.overwrite(
        spark.range(5).select(F.col("id").alias("skey"),
                              F.col("id").alias("doc_id")),
        t, n_files=1, bloom_for={"skey": 1 << 10},
    )
    new = S.read_manifest(t, 2)["files"][0]["bloom"]["skey"]["path"]
    deleted = S.vacuum(t, keep_versions=1)
    assert old in deleted and not os.path.exists(os.path.join(t, old))
    assert os.path.exists(os.path.join(t, new))
    # the retained snapshot's lookup path still works end-to-end
    assert S.read(spark, t, key_in=("skey", [3])).count() >= 1


def test_bloom_composes_with_hidden_partitioning(spark, tmp_path):
    # bloom sidecars on a bucket-partitioned commit: partition pruning
    # narrows to the probe keys' buckets, blooms then skip within them
    # (file names under col=value dirs flatten into sidecar names)
    t = os.path.join(str(tmp_path), "combo")
    rows = spark.range(0, 4000).select(
        ((F.col("id") * SCRAMBLE) % MOD).alias("skey"),
        F.col("id").alias("doc_id"),
    )
    S.overwrite(rows, t, n_files=2,
                partition_by=("bucket", "doc_id", 4),
                bloom_for={"skey": 1 << 14})
    man = S.read_manifest(t, 1)
    assert all("bloom" in e and e.get("partition") for e in man["files"]
               if e["rows"])
    probes = [_skey(i) for i in (11, 222)]
    got = S.read(spark, t, key_in=("skey", probes))
    assert sorted(r.doc_id for r in
                  got.filter(F.col("skey").isin(probes)).collect()) \
        == [11, 222]
    scanned = got.select(F.input_file_name()).distinct().count()
    assert scanned < len(man["files"])


def test_prune_partitions_and_key_in_compose(spark, tmp_path):
    # the three manifest-pruning paths AND together without losing rows
    t = os.path.join(str(tmp_path), "compose")
    rows = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        ((F.col("id") * SCRAMBLE) % MOD).alias("skey"),
    )
    S.overwrite(rows, t, n_files=2, partition_by="p",
                bloom_for={"skey": 1 << 14})
    want = _skey(601)  # doc 601: p = '1'
    got = S.read(
        spark, t,
        prune=("k", 0, 1000),
        partitions={"p": ["1"]},
        key_in=("skey", [want]),
    )
    assert [r.k for r in got.filter(F.col("skey") == want).collect()] \
        == [601]

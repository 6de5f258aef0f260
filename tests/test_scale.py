"""Scale-tooling tests (operators/scale.py): bucketed joins are
exchange-free, salted join/agg match their unsalted equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import scale


@pytest.fixture()
def skewed(spark):
    # key 1 is hot: 500 of 520 rows
    hot = spark.range(500).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(20).select((F.col("id") % 4 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"), (9, "unmatched")],
        ["k", "name"],
    )


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = scale.salted_join(skewed, dim, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(skewed, dim):
    out = scale.salted_join(skewed.filter(F.col("k") <= 2), dim.filter(F.col("k") == 9),
                            "k", how="left")
    assert out.count() == skewed.filter(F.col("k") <= 2).count()
    assert out.filter(F.col("name").isNotNull()).count() == 0


def test_salted_sum_count_matches_direct(skewed):
    direct = {
        (r.k): (r.s, r.n)
        for r in skewed.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("*").alias("n")
        ).collect()
    }
    salted = {
        (r.k): (r.sum_v, r.n_rows) for r in scale.salted_sum_count(skewed, "k", "v").collect()
    }
    assert direct == salted


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    scale.write_bucketed(left, "bk_left", "k", buckets=8, path=str(tmp_path / "l"))
    scale.write_bucketed(right, "bk_right", "k", buckets=8, path=str(tmp_path / "r"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the exchange (or its absence) is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = scale.bucketed_join(spark, "bk_left", "bk_right", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: bucket layout IS the shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned layout + a partition-column filter must prune at
    PLAN time: the scan's PartitionFilters carry the predicate and only
    the matching directory is read — the data-skipping lever that turns
    a 100 TB scan into a one-partition read."""
    from magshield_data_pipeline_spark.sources.parquet import read_table

    events = read_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_parted")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)
    scan = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    # and the result only contains the pruned partition
    assert scan.select("event_type").distinct().collect() == [("click",)]


def test_pair_pipelines_leave_no_cache_after_release(spark):
    # bench.py / oracle_harness release caller-owned persisted frames
    # between queries (session.release_caches); a full 93-query session
    # must not accumulate cache entries from the LSH/pair pipelines
    from magshield_data_pipeline_spark.operators import dedup as D
    from magshield_data_pipeline_spark.operators import similarity as V
    from magshield_data_pipeline_spark.session import release_caches

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "the quick brown fox jumps over the lazy dog again and again"),
         (3, "a completely different document about spark aggregation plans")],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(8)]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    planes = V.srp_hyperplanes(n_bands=2, rows_per_band=4, dim=8, seed=1)

    D.jaccard_pairs(docs, text_col="text", id_col="doc_id", threshold=0.5).count()
    V.srp_candidate_pairs(emb, planes).count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    release_caches(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0

"""Round-trip tests for sinks (K1/K2) and the report-ingest pipeline
(S5-S7, F11/F12/F14)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark import schemas as SCH
from magshield_data_pipeline_spark import sinks
from magshield_data_pipeline_spark.sources import reports


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], ["id", "val"]
    )


def test_overwrite_by_name_replaces(spark, small_df, tmp_path):
    base = str(tmp_path)
    p1 = sinks.overwrite_by_name(small_df, base, "export.parquet")
    assert spark.read.parquet(p1).count() == 3
    # K2: a second write under the same name REPLACES (upsert semantics)
    p2 = sinks.overwrite_by_name(small_df.filter(F.col("id") == 1), base, "export.parquet")
    assert p1 == p2
    assert spark.read.parquet(p2).count() == 1


def test_write_excel_empty_skips(spark, small_df, tmp_path):
    empty = small_df.filter(F.lit(False))
    assert sinks.write_excel(empty, str(tmp_path / "out.xlsx")) is None


def test_write_excel_round_trip(spark, small_df, tmp_path):
    out = sinks.write_excel(small_df, str(tmp_path / "out.xlsx"))
    assert out is not None and os.path.exists(out)
    if out.endswith(".xlsx"):  # openpyxl present
        import pandas as pd

        assert len(pd.read_excel(out)) == 3
    else:  # documented CSV fallback in openpyxl-less images
        assert out.endswith(".csv")
        assert reports.read_csv(spark, out).count() == 3


def test_csv_round_trip_and_sniff(spark, small_df, tmp_path):
    csv_path = str(tmp_path / "report.data")  # no extension → sniffed
    small_df.toPandas().to_csv(csv_path, index=False)
    df = reports.sniff_and_read(spark, csv_path)
    assert df.count() == 3 and set(df.columns) == {"id", "val"}


def test_mail_report_ingest_pipeline(spark):
    href = "https://r.example.com/redirect?url=https%3A%2F%2Ffiles.example.com%2Freports%2FPipeline%20Report.csv"
    mail = spark.createDataFrame(
        [
            {"message_id": "m1", "receivedDateTime": "2024-02-01 10:00:00",
             "sender_address": "reports@crm.example", "subject": "Weekly Pipeline Report",
             "body_html": f'<html><a class="x" href="{href}">Download Report</a></html>'},
            # newer, matching sender, but wrong subject → filtered after top-n
            {"message_id": "m2", "receivedDateTime": "2024-02-02 10:00:00",
             "sender_address": "reports@crm.example", "subject": "Invoice summary",
             "body_html": "<a href='https://x/other'>Download Report</a>"},
            # wrong sender → excluded by the scan predicate
            {"message_id": "m3", "receivedDateTime": "2024-02-03 10:00:00",
             "sender_address": "spam@other", "subject": "Pipeline Report",
             "body_html": "<a href='https://x/spam'>Download Report</a>"},
        ],
        schema=SCH.MAIL_MESSAGE_SCHEMA,
    )
    msg = reports.latest_report_message(
        mail, "reports@crm.example", "Pipeline Report", "2024-01-20 00:00:00"
    )
    [link] = reports.extract_report_link(msg).collect()
    assert link.message_id == "m1"
    assert link.href == href
    assert link.report_url == "https://files.example.com/reports/Pipeline Report.csv"
    assert link.report_filename == "Pipeline Report.csv"


def test_extract_link_null_on_miss(spark):
    mail = spark.createDataFrame(
        [{"message_id": "m1", "receivedDateTime": "2024-02-01 00:00:00",
          "sender_address": "s", "subject": "x", "body_html": "<p>no links</p>"}],
        schema=SCH.MAIL_MESSAGE_SCHEMA,
    )
    [row] = reports.extract_report_link(mail).collect()
    assert row.href is None  # F11: null on miss (bs4 parity)


def test_read_evolved_merges_schemas_across_files(spark, tmp_path):
    # two files written under different schema versions: the merged
    # read exposes the union of columns, old rows null-filled
    from magshield_data_pipeline_spark.sources.parquet import read_evolved

    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    v1.write.parquet(str(tmp_path / "evt" / "p1"))
    v2.write.parquet(str(tmp_path / "evt" / "p2"))
    out = read_evolved(spark, str(tmp_path / "evt" / "*"))
    rows = {r["id"]: (r["name"], r["score"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_evolve_union_matches_by_name_and_null_fills(spark):
    from magshield_data_pipeline_spark.sources.parquet import evolve_union

    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([("y", 2, 1.5)], "name string, id long, score double")
    out = evolve_union(a, b).orderBy("id").collect()
    assert [(r["id"], r["name"], r["score"]) for r in out] == [
        (1, "x", None),
        (2, "y", 1.5),
    ]


def test_bloom_filter_write_carries_filter_bytes_and_stays_correct(
    spark, tmp_path
):
    """write_point_lookup_optimized structural evidence: the bloom-
    enabled file must carry the filter's bytes (parquet-mr sizes a
    split-block bloom from the declared NDV at 1% fpp, rounded up to a
    power-of-two — for ndv=200k that is exactly 256 KiB), and point
    lookups on the bloomed column stay exact. The reader-side row-group
    skip itself is not observable in this environment (pyarrow 16 does
    not expose bloom metadata; Spark's explain has no skip counters),
    so the write-side byte-count shape IS the checkable contract."""
    import glob
    import os

    from pyspark.sql import functions as F

    from magshield_data_pipeline_spark.sources.parquet import (
        write_point_lookup_optimized,
    )

    df = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.write.parquet(plain)
    write_point_lookup_optimized(df, bloomed, {"k": 200_000})

    def nbytes(d):
        return sum(
            os.path.getsize(p) for p in glob.glob(d + "/*.parquet")
        )

    delta = nbytes(bloomed) - nbytes(plain)
    # one row group, one 2^18-byte blocked bloom (+ footer slack)
    assert 256 * 1024 <= delta < 256 * 1024 + 4096, delta
    # membership semantics unharmed: hit and miss both exact
    got = spark.read.parquet(bloomed).filter(F.col("k") == 123_456).collect()
    assert [(r["k"], r["v"]) for r in got] == [(123_456, 123_456 % 97)]
    assert spark.read.parquet(bloomed).filter(F.col("k") == -5).count() == 0


def test_read_table_spread_conditional_no_op(spark, tmp_path):
    """read_table_spread parallelizes the driver's single-split fixture
    but must be a NO-OP on a multi-split source (the at-scale case) —
    no RoundRobin exchange when the scan already yields >= target
    partitions."""
    from magshield_data_pipeline_spark.sources.parquet import (
        read_table,
        read_table_spread,
    )

    target = min(spark.sparkContext.defaultParallelism, 16)

    # single-file fixture: spread kicks in
    narrow = read_table(spark, "/root/testdata/sf0.001", "documents")
    assert narrow.rdd.getNumPartitions() < target
    spread = read_table_spread(spark, "/root/testdata/sf0.001", "documents")
    assert spread.rdd.getNumPartitions() == target

    # many-file layout: condition is false, plan untouched
    wide_dir = tmp_path / "wide"
    spark.range(2000).selectExpr(
        "id AS doc_id", "repeat('x', 10) AS text",
        "'en' AS lang", "'s' AS source", "10 AS n_chars"
    ).repartition(target).write.parquet(str(wide_dir / "documents.parquet"))
    wide = read_table_spread(spark, str(wide_dir), "documents")
    assert wide.rdd.getNumPartitions() >= target
    assert "RoundRobinPartitioning" not in wide._jdf.queryExecution().executedPlan().toString()

    # spread output is the same rows (partitioning-only)
    a = sorted(r.doc_id for r in narrow.select("doc_id").collect())
    b = sorted(r.doc_id for r in spread.select("doc_id").collect())
    assert a == b


# ---------------------------------------------------------------------------
# r8: Python DataSource writer — the all-or-nothing publish contract


def test_jsonl_sink_failed_job_publishes_nothing(spark, tmp_path):
    """A task failure mid-job must leave NO published part files and NO
    _SUCCESS manifest — abort removes stage debris, and a reader
    gated on the manifest sees the pre-job state (the upload-then-swap
    contract the sink distributes)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from magshield_data_pipeline_spark.sources import jsonl_sink as sink

    sink.register(spark)
    out = str(tmp_path / "out")
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") == 63, F.raise_error(F.lit("boom")))
        .otherwise(F.lit("v")).alias("v"),
    )
    with pytest.raises(Exception, match="boom"):
        df.write.format("jsonl_sink").option("path", out).mode(
            "append"
        ).save()
    published = (
        [f for f in os.listdir(out) if not f.startswith("_")]
        if os.path.isdir(out)
        else []
    )
    assert published == [], f"partial output published: {published}"
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_jsonl_sink_commit_manifest_counts_rows(spark, tmp_path):
    import json
    import os

    from magshield_data_pipeline_spark.sources import jsonl_sink as sink

    sink.register(spark)
    out = str(tmp_path / "ok")
    spark.range(57).repartition(4).write.format("jsonl_sink").option(
        "path", out
    ).mode("append").save()
    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 57
    assert os.listdir(os.path.join(out, "_staged")) == []
    back = spark.read.schema("id long").option(
        "pathGlobFilter", "part-*.jsonl"
    ).json(out)
    assert back.count() == 57


def test_jsonl_sink_second_job_never_overwrites_first(spark, tmp_path):
    import os

    from magshield_data_pipeline_spark.sources import jsonl_sink as sink

    sink.register(spark)
    out = str(tmp_path / "two")
    spark.range(10).repartition(2).write.format("jsonl_sink").option(
        "path", out
    ).mode("append").save()
    first = {f for f in os.listdir(out) if f.startswith("part-")}
    spark.range(10, 25).repartition(2).write.format("jsonl_sink").option(
        "path", out
    ).mode("append").save()
    both = {f for f in os.listdir(out) if f.startswith("part-")}
    assert first < both, "second job clobbered the first job's files"
    back = spark.read.schema("id long").option(
        "pathGlobFilter", "part-*.jsonl"
    ).json(out)
    assert back.count() == 25  # union of both jobs, nothing lost

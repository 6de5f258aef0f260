"""Streaming + event-time window tests (streaming/windows.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources.parquet import read_table
from magshield_data_pipeline_spark.streaming import windows as W

SF_SMALL = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn("event_type", F.lit("t"))


def test_stream_matches_batch_tumbling(spark):
    batch = W.tumbling_counts(read_table(spark, SF_SMALL, "events"), "1 hour")
    stream = W.run_available_now(
        W.tumbling_counts(W.read_events_stream(spark, SF_SMALL), "1 hour")
    )
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, stream.collect()))
    assert b == s and len(b) > 0


def test_session_windows_gap_semantics(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 10, 30, 0), 1.0),  # exactly 30 min gap → MERGES (inclusive)
        (1, datetime(2024, 1, 1, 11, 0, 0, 1), 1.0),  # 30 min + 1µs → NEW session
        (2, datetime(2024, 1, 1, 10, 0, 0), 2.0),
    ]
    out = W.session_windows(_events(spark, rows), "30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 2
    first = min(per_user[1], key=lambda r: r.session_start)
    assert first.n_events == 2
    assert first.session_start.startswith("2024-01-01 10:00:00")
    assert first.session_end.startswith("2024-01-01 11:00:00")  # last event + gap
    assert len(per_user[2]) == 1


def test_sliding_windows_double_count(spark):
    rows = [(1, datetime(2024, 1, 1, 10, 2, 0), 1.0)]
    out = W.sliding_user_activity(_events(spark, rows), "10 minutes", "5 minutes").collect()
    starts = sorted(r.window_start for r in out)
    # one event in a width=10/slide=5 landscape appears in exactly 2 windows
    assert starts == ["2024-01-01 09:55:00", "2024-01-01 10:00:00"]
    assert all(r.n_events == 1 for r in out)


def test_tumbling_counts_sum(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 15, 0), 1.5),
        (1, datetime(2024, 1, 1, 10, 45, 0), 2.5),
        (1, datetime(2024, 1, 1, 11, 5, 0), 3.0),
    ]
    out = {r.window_start: (r.n_events, r.value_sum) for r in W.tumbling_counts(
        _events(spark, rows), "1 hour"
    ).collect()}
    assert out == {
        "2024-01-01 10:00:00": (2, 4.0),
        "2024-01-01 11:00:00": (1, 3.0),
    }

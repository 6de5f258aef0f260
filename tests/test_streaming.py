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


def test_stateful_sessionizer_in_batch_closure(spark):
    """Sessions proven closed by a later same-user event emit in-batch;
    the open tail stays in state (far-future watermark, no timeout)."""
    from magshield_data_pipeline_spark.streaming import stateful as ST

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 10, 10, 0), 2.0),
        (1, datetime(2024, 1, 1, 12, 0, 0), 4.0),  # >30min → closes session 1
        (2, datetime(2024, 1, 1, 9, 0, 0), 8.0),  # only session for user 2
    ]
    df = _events(spark, rows)
    path = str(tmp_parquet(spark, df))
    stream = _events_stream(spark, path, df.schema)
    out = W.run_available_now(
        ST.sessionize_stateful(stream, 30, watermark="3650 days"),
        output_mode="append",
    ).collect()
    # only user 1's first session is proven closed; both tails held back
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.n_events == 2 and r.value_sum == 3.0
    assert r.session_start == datetime(2024, 1, 1, 10, 0, 0)
    assert r.session_end == datetime(2024, 1, 1, 10, 40, 0)  # last + gap


def test_stateful_sessionizer_timeout_flush(spark):
    """A second micro-batch advances the watermark past a dormant
    user's end+gap → the event-time timeout flushes their tail."""
    from magshield_data_pipeline_spark.streaming import stateful as ST

    early = _events(spark, [(7, datetime(2024, 1, 1, 10, 0, 0), 5.0)])
    late = _events(spark, [(8, datetime(2024, 1, 2, 10, 0, 0), 1.0)])
    path = tmp_parquet(spark, early)  # file 1
    stream = _events_stream(spark, str(path), early.schema, one_file_per_batch=True)
    tmp_parquet(spark, late, path)  # file 2, later mtime
    out = W.run_available_now(
        ST.sessionize_stateful(stream, 30, watermark="10 minutes"),
        output_mode="append",
    ).collect()
    # batch 2's day-later event pushes the watermark past user 7's
    # end+gap → their session flushes via state timeout
    flushed = [r for r in out if r.user_id == 7]
    assert len(flushed) == 1
    assert flushed[0].n_events == 1 and flushed[0].value_sum == 5.0
    assert flushed[0].session_end == datetime(2024, 1, 1, 10, 30, 0)


def tmp_parquet(spark, df, path=None):
    import tempfile
    import time
    import uuid
    from pathlib import Path

    if path is None:
        path = Path(tempfile.mkdtemp(prefix="events_stream_"))
    # distinct mtimes give the file source a deterministic batch order
    time.sleep(1.1)
    df.coalesce(1).write.mode("append").parquet(str(path))
    return path


def _events_stream(spark, path, schema, one_file_per_batch=False):
    reader = spark.readStream.schema(schema)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", "1")
    return reader.parquet(path)


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


def test_stream_refresh_by_name_matches_batch(spark, tmp_path):
    """foreachBatch + overwrite_by_name: the streamed tumbling rollup
    lands in the named target and equals the batch answer."""
    from magshield_data_pipeline_spark.sources.parquet import read_table as _rt
    from magshield_data_pipeline_spark.streaming import sinks as SS

    stream = W.read_events_stream(spark, SF_SMALL)
    path = SS.stream_refresh_by_name(
        W.tumbling_counts(stream, "1 hour"), str(tmp_path), "Hourly Rollup"
    )
    assert path is not None and "Hourly Rollup" in path
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(
        map(tuple, W.tumbling_counts(_rt(spark, SF_SMALL, "events"), "1 hour").collect())
    )
    assert got == want and len(got) > 0


def test_dedup_stream_matches_batch_distinct(spark):
    stream = W.read_events_stream(spark, SF_SMALL)
    got = {
        (r.user_id, r.event_type)
        for r in W.run_available_now(
            W.dedup_stream(stream), output_mode="append"
        ).collect()
    }
    batch = read_table(spark, SF_SMALL, "events")
    want = {
        (r.user_id, r.event_type)
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert got == want and len(got) > 0


def test_streaming_funnel_progress_across_batches(spark):
    """A user's funnel state carries across micro-batches: signup in
    batch 1, click in batch 2 → the change feed shows stage 1 then
    stage 2, with the click anchored at/after the carried signup."""
    from magshield_data_pipeline_spark.streaming import stateful as ST

    def ev(user, dt, etype):
        return (user, dt, etype)

    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b1 = frame([
        ev(1, datetime(2024, 1, 1, 10, 0, 0), "signup"),
        # a click BEFORE the signup — must never count
        ev(2, datetime(2024, 1, 1, 9, 0, 0), "click"),
        ev(2, datetime(2024, 1, 1, 10, 0, 0), "signup"),
        # user 3's CLICK arrives a batch before their signup: the
        # buffered stage minimum must count once the signup unlocks it
        ev(3, datetime(2024, 1, 1, 11, 30, 0), "click"),
    ])
    b2 = frame([
        ev(1, datetime(2024, 1, 1, 11, 0, 0), "click"),
        ev(2, datetime(2024, 1, 1, 12, 0, 0), "click"),
        ev(3, datetime(2024, 1, 1, 11, 0, 0), "signup"),
    ])
    path = tmp_parquet(spark, b1)
    stream = _events_stream(spark, str(path), b1.schema, one_file_per_batch=True)
    tmp_parquet(spark, b2, path)
    out = W.run_available_now(
        ST.funnel_stateful(stream, watermark="10 minutes"),
        output_mode="append",
    ).collect()
    u1 = sorted((r for r in out if r.user_id == 1), key=lambda r: r.n_stages)
    assert [r.n_stages for r in u1] == [1, 2]
    assert u1[1].t1 == datetime(2024, 1, 1, 11, 0, 0)
    u2 = sorted((r for r in out if r.user_id == 2), key=lambda r: r.n_stages)
    # user 2's pre-signup click ignored in batch 1; batch-2 click counts
    assert [r.n_stages for r in u2] == [1, 2]
    assert u2[1].t1 == datetime(2024, 1, 1, 12, 0, 0)
    # user 3 entered the funnel only in batch 2, but their batch-1
    # click (11:30 >= signup 11:00) counts via the buffered minimum —
    # a single progress row already at stage 2
    u3 = [r for r in out if r.user_id == 3]
    assert [r.n_stages for r in u3] == [2]
    assert u3[0].t1 == datetime(2024, 1, 1, 11, 30, 0)


def test_streaming_funnel_three_batches_reverse_stage_order(spark):
    """VERDICT r4 task 4: drive funnel_stateful with maxFilesPerTrigger=1
    over THREE files whose stage events arrive in fully REVERSED stage
    order (purchase, then click, then signup), exercising state.exists
    resume and the buffered-minimum unlock path across multiple
    micro-batch commits — including the once-residual shadowing case
    the k-smallest buffer (k=3) now resolves EXACTLY against the batch
    oracle.

    The watermark is 3 hours: the reversed delivery spans 2 hours of
    event time, and Spark ITSELF drops applyInPandasWithState input
    rows older than the (one-batch-lagged) watermark before the
    operator sees them — the buffered-minimum path covers reordering
    WITHIN the allowed lateness, not beyond it."""
    from magshield_data_pipeline_spark.streaming import stateful as ST

    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # user 10: full conversion delivered in reverse stage order, one
    # stage per micro-batch — every stage must come from the buffers.
    # user 11: signup in b1, click two batches later.
    # user 12: the shadowing case — an ineligible 9:00 click AND an
    # eligible 10:30 click both before their signup arrives; a single
    # buffered minimum would keep only 9:00 and under-report, but the
    # k-smallest buffer retains 10:30 too, so once signup (10:00)
    # lands the tracker must report t1 = 10:30 exactly (batch parity).
    b1 = frame([
        (10, datetime(2024, 1, 1, 13, 0, 0), "purchase"),
        (11, datetime(2024, 1, 1, 10, 0, 0), "signup"),
        (12, datetime(2024, 1, 1, 9, 0, 0), "click"),
        (12, datetime(2024, 1, 1, 10, 30, 0), "click"),
    ])
    b2 = frame([
        (10, datetime(2024, 1, 1, 12, 0, 0), "click"),
        (12, datetime(2024, 1, 1, 10, 0, 0), "signup"),
    ])
    b3 = frame([
        (10, datetime(2024, 1, 1, 11, 0, 0), "signup"),
        (11, datetime(2024, 1, 1, 10, 30, 0), "click"),
    ])
    path = tmp_parquet(spark, b1)
    stream = _events_stream(spark, str(path), b1.schema, one_file_per_batch=True)
    tmp_parquet(spark, b2, path)
    tmp_parquet(spark, b3, path)
    out = W.run_available_now(
        ST.funnel_stateful(stream, watermark="3 hours"),
        output_mode="append",
    ).collect()

    # user 10 enters the funnel only in batch 3, where both buffered
    # later stages (click 12:00 >= signup 11:00, purchase 13:00 >=
    # click 12:00) unlock at once: a single row, fully converted
    u10 = [r for r in out if r.user_id == 10]
    assert [r.n_stages for r in u10] == [3]
    assert u10[0].t0 == datetime(2024, 1, 1, 11, 0, 0)
    assert u10[0].t1 == datetime(2024, 1, 1, 12, 0, 0)
    assert u10[0].t2 == datetime(2024, 1, 1, 13, 0, 0)

    # user 11: stage 1 row in batch 1 (state.exists False), stage 2 row
    # in batch 3 (state.exists True resume, t0 carried across commits)
    u11 = sorted((r for r in out if r.user_id == 11), key=lambda r: r.n_stages)
    assert [r.n_stages for r in u11] == [1, 2]
    assert u11[1].t0 == datetime(2024, 1, 1, 10, 0, 0)
    assert u11[1].t1 == datetime(2024, 1, 1, 10, 30, 0)

    # user 12: the shadowed-but-buffered click now unlocks EXACTLY —
    # t1 = 10:30, the batch-oracle answer (was the documented residual
    # under-report before the k-smallest buffer)
    u12 = sorted((r for r in out if r.user_id == 12), key=lambda r: r.n_stages)
    assert u12, "user 12 entered the funnel in batch 2"
    final12 = max(u12, key=lambda r: r.n_stages)
    assert final12.n_stages == 2
    assert final12.t0 == datetime(2024, 1, 1, 10, 0, 0)
    assert final12.t1 == datetime(2024, 1, 1, 10, 30, 0)


def test_dedup_within_watermark_matches_batch_distinct(spark, tmp_path):
    # with a delay wider than the fixture's whole event-time span, no
    # key's state can expire mid-run, so the watermark variant must
    # equal batch DISTINCT exactly — proving the state-expiring
    # operator wires correctly before production narrows the horizon
    from magshield_data_pipeline_spark.sources.parquet import read_table
    from magshield_data_pipeline_spark.streaming import windows as W

    sf = "/root/testdata/sf0.001"
    stream = W.read_events_stream(spark, sf)
    out = W.run_available_now(
        W.dedup_stream_within_watermark(stream, delay="3650 days"),
        output_mode="append",
        state_partitions=8,
    )
    got = {(r["user_id"], r["event_type"]) for r in out.collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in read_table(spark, sf, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want


def test_stream_stream_join_across_micro_batches(spark):
    """Cross-batch state retention: a click buffered in micro-batch 1
    must still join a purchase arriving in micro-batch 2 (within the
    window + allowed lateness), and a purchase outside the 30-minute
    window must never pair."""
    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type", "event_id"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b1 = frame([
        (1, datetime(2024, 1, 1, 10, 0, 0), "click", 100),
        (2, datetime(2024, 1, 1, 10, 0, 0), "click", 200),
    ])
    b2 = frame([
        (1, datetime(2024, 1, 1, 10, 20, 0), "purchase", 101),  # in window
        (2, datetime(2024, 1, 1, 11, 30, 0), "purchase", 201),  # outside
    ])
    path = tmp_parquet(spark, b1)
    stream = _events_stream(spark, str(path), b1.schema, one_file_per_batch=True)
    tmp_parquet(spark, b2, path)
    out = W.run_available_now(
        W.stream_stream_interval_join(
            stream, within="30 minutes", watermark="2 hours"
        ),
        output_mode="append",
        state_partitions=4,
    ).collect()
    pairs = sorted((r.user_id, r.click_id, r.purchase_id) for r in out)
    assert pairs == [(1, 100, 101)]


def test_streaming_funnel_beyond_k_buffer_under_reports_never_invents(spark):
    """Contract bound of the k=3 buffer: when MORE than k distinct
    stage-1 times smaller than the eventual winner arrive before the
    signup lands, the winner may be evicted from the buffer — the
    tracker must then report a later valid time or nothing, and must
    NEVER report an ineligible (pre-signup) time."""
    from magshield_data_pipeline_spark.streaming import stateful as ST

    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # batch 1: four clicks below the eventual winner (9:00..9:45) plus
    # the true winner 10:30 — k=3 keeps {9:00, 9:15, 9:30}: the winner
    # is evicted before the signup (10:00) arrives in batch 2
    b1 = frame([
        (1, datetime(2024, 1, 1, 9, 0, 0), "click"),
        (1, datetime(2024, 1, 1, 9, 15, 0), "click"),
        (1, datetime(2024, 1, 1, 9, 30, 0), "click"),
        (1, datetime(2024, 1, 1, 9, 45, 0), "click"),
        (1, datetime(2024, 1, 1, 10, 30, 0), "click"),
    ])
    b2 = frame([(1, datetime(2024, 1, 1, 10, 0, 0), "signup")])
    path = tmp_parquet(spark, b1)
    stream = _events_stream(spark, str(path), b1.schema, one_file_per_batch=True)
    tmp_parquet(spark, b2, path)
    out = W.run_available_now(
        ST.funnel_stateful(stream, watermark="3 hours"), output_mode="append"
    ).collect()
    rows = [r for r in out if r.user_id == 1]
    assert rows, "funnel entered in batch 2"
    final = max(rows, key=lambda r: r.n_stages)
    assert final.t0 == datetime(2024, 1, 1, 10, 0, 0)
    # under-report is allowed (t1 None); an INVENTED pre-signup t1 is not
    assert final.t1 is None or final.t1 >= datetime(2024, 1, 1, 10, 0, 0)


@pytest.mark.parametrize("extra", [-1, 0, 1])
def test_streaming_funnel_k_buffer_boundary_sweep(spark, extra):
    """The k-buffer's exactness boundary, pinned EXACTLY (VERDICT r6
    item 8): deliver k+extra distinct stage-1 times, all SMALLER than
    the eventual winner and all ineligible (pre-signup), in the batch
    BEFORE the signup lands.

    - extra = -1 (k-1 shadows): the winner still fits in the k-slot
      buffer — the tracker must report it EXACTLY (batch parity);
    - extra = 0 (exactly k shadows): the winner is evicted — the FIRST
      under-report, by construction: t1 must be None (no later click
      exists), never an ineligible time;
    - extra = +1: same under-report, one past the boundary.

    This is the contract sentence at streaming/stateful.py (exact for
    "fewer than k distinct shadowing times") made mechanical.
    """
    from magshield_data_pipeline_spark.streaming import stateful as ST
    from magshield_data_pipeline_spark.streaming.stateful import (
        _FUNNEL_BUFFER_K as K,
    )

    n_shadows = K + extra
    winner = datetime(2024, 1, 1, 10, 30, 0)
    signup = datetime(2024, 1, 1, 10, 0, 0)

    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b1 = frame(
        [(1, datetime(2024, 1, 1, 9, i * 5, 0), "click") for i in range(n_shadows)]
        + [(1, winner, "click")]
    )
    b2 = frame([(1, signup, "signup")])
    path = tmp_parquet(spark, b1)
    stream = _events_stream(spark, str(path), b1.schema, one_file_per_batch=True)
    tmp_parquet(spark, b2, path)
    out = W.run_available_now(
        ST.funnel_stateful(stream, watermark="3 hours"), output_mode="append"
    ).collect()
    rows = [r for r in out if r.user_id == 1]
    assert rows, "funnel entered in batch 2"
    final = max(rows, key=lambda r: r.n_stages)
    assert final.t0 == signup
    if extra < 0:
        # winner survives the buffer: exact batch parity
        assert final.t1 == winner, f"{n_shadows} shadows must stay exact"
    else:
        # at/past the boundary: under-report (None — no later click
        # exists to fall back to), NEVER an invented pre-signup time
        assert final.t1 is None, (
            f"{n_shadows} shadows: expected the documented under-report"
        )


def test_checkpoint_restart_resumes_state(spark):
    """The production restart path: a streaming query stopped and
    re-started against the SAME checkpoint must RESUME — committed
    source files are not reprocessed and the state store restores —
    rather than start over. Requires a recoverable sink (the memory
    sink refuses checkpoint recovery), so this drives streaming dedup
    into a parquet sink across two AvailableNow runs: if state were
    lost, the duplicate key would re-emit and the sink would carry two
    (1, click) rows; if the file log were lost, user 2 would re-emit
    too."""
    import tempfile

    from datetime import datetime as dt

    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    ckpt = tempfile.mkdtemp(prefix="ckpt_resume_")
    out = tempfile.mkdtemp(prefix="sink_resume_")

    def run_once(schema, path):
        q = (
            W.dedup_stream(_events_stream(spark, str(path), schema))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1 = frame([
        (1, dt(2024, 1, 1, 10, 0, 0), "click"),
        (2, dt(2024, 1, 1, 10, 5, 0), "click"),
    ])
    path = tmp_parquet(spark, b1)
    run_once(b1.schema, path)
    first = spark.read.parquet(out).collect()
    assert {(r.user_id, r.event_type) for r in first} == {
        (1, "click"), (2, "click"),
    }

    # the query has STOPPED (AvailableNow drained). Deliver one
    # duplicate key and one new key, then restart from the checkpoint.
    b2 = frame([
        (1, dt(2024, 1, 1, 11, 0, 0), "click"),   # dup: state must remember
        (3, dt(2024, 1, 1, 11, 5, 0), "click"),   # new key
    ])
    tmp_parquet(spark, b2, path)
    run_once(b1.schema, path)
    rows = spark.read.parquet(out).collect()
    keys = sorted((r.user_id, r.event_type) for r in rows)
    assert keys == [(1, "click"), (2, "click"), (3, "click")], (
        "restart must restore dedup state (one emission per key, no "
        f"re-emits) and skip committed files; sink rows: {keys}"
    )


def test_foreachbatch_upsert_maintains_rollup_incrementally(spark):
    """Streaming incremental view maintenance — the production sink
    pattern for a continuously-maintained rollup table: an update-mode
    streaming aggregation feeds foreachBatch, each micro-batch MERGEs
    its changed rows into a parquet table (sinks.merge_upsert +
    overwrite_by_name), and after two deliveries the maintained table
    must equal the from-scratch batch rollup. Pins that (a) update
    mode emits only CHANGED groups per batch and (b) the merge applies
    them idempotently by key — the lakehouse MERGE INTO loop."""
    import os
    import tempfile

    from datetime import datetime as dt

    from magshield_data_pipeline_spark import sinks as K

    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "value"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    ckpt = tempfile.mkdtemp(prefix="ckpt_ivm_")
    table_dir = tempfile.mkdtemp(prefix="ivm_table_")
    table_name = "rollup"
    table_path = os.path.join(table_dir, table_name)

    def apply_batch(batch_df, _batch_id):
        changed = batch_df.persist()
        if os.path.exists(os.path.join(table_path, "_SUCCESS")):
            existing = changed.sparkSession.read.parquet(table_path)
            merged = K.merge_upsert(existing, changed, ["user_id"])
        else:
            merged = changed
        # rewrite cycle: read-merge-rewrite needs the merged frame
        # materialized before the overwrite truncates its own input
        out = merged.persist()
        out.count()
        K.overwrite_by_name(out, table_dir, table_name)
        out.unpersist()
        changed.unpersist()

    def run_once(schema, path):
        q = (
            _events_stream(spark, str(path), schema)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("value_sum"),
            )
            .writeStream.foreachBatch(apply_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1 = frame([
        (1, dt(2024, 1, 1, 10, 0, 0), 1.0),
        (1, dt(2024, 1, 1, 10, 1, 0), 2.0),
        (2, dt(2024, 1, 1, 10, 2, 0), 5.0),
    ])
    path = tmp_parquet(spark, b1)
    run_once(b1.schema, path)
    t1 = {(r.user_id, r.n_events, r.value_sum)
          for r in spark.read.parquet(table_path).collect()}
    assert t1 == {(1, 2, 3.0), (2, 1, 5.0)}

    # second delivery touches user 1 (update) and user 3 (insert);
    # user 2 must survive untouched through the merge
    b2 = frame([
        (1, dt(2024, 1, 1, 11, 0, 0), 4.0),
        (3, dt(2024, 1, 1, 11, 1, 0), 7.0),
    ])
    tmp_parquet(spark, b2, path)
    run_once(b1.schema, path)
    t2 = {(r.user_id, r.n_events, r.value_sum)
          for r in spark.read.parquet(table_path).collect()}
    assert t2 == {(1, 3, 7.0), (2, 1, 5.0), (3, 1, 7.0)}, (
        "incrementally maintained table diverged from the batch "
        f"rollup: {sorted(t2)}"
    )


def test_outer_join_null_emission_gated_by_watermark(spark):
    """The left-outer contract (r8): a match emits eagerly; an
    unmatched click emits null-padded ONLY once the global watermark
    (min of both sides' max event time - delay) passes l_ts + within;
    a click still inside that horizon at drain is BUFFERED, never
    emitted — the exact model the registered oracle states."""
    def frame(rows):
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type", "event_id"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    rows = frame([
        # matched click: emits (1, 100, 101)
        (1, datetime(2024, 1, 1, 10, 0, 0), "click", 100),
        (1, datetime(2024, 1, 1, 10, 20, 0), "purchase", 101),
        # unmatched click, horizon 9:30+30m=10:00 < wm → flushes null
        (2, datetime(2024, 1, 1, 9, 30, 0), "click", 200),
        # unmatched click, horizon 11:50+30m=12:20 > wm → stays buffered
        (3, datetime(2024, 1, 1, 11, 50, 0), "click", 300),
        # advances both watermarks to 12:00 - 5m = 11:55
        (9, datetime(2024, 1, 1, 12, 0, 0), "click", 900),
        (9, datetime(2024, 1, 1, 12, 0, 0), "purchase", 901),
    ])
    path = tmp_parquet(spark, rows)
    stream = _events_stream(spark, str(path), rows.schema)
    out = W.run_available_now(
        W.stream_stream_interval_join_outer(
            stream, within="30 minutes", watermark="5 minutes"
        ),
        output_mode="append",
        state_partitions=4,
    ).collect()
    got = sorted((r.user_id, r.click_id, r.purchase_id) for r in out)
    # click 900's own horizon (12:30) is past wm (11:55) → buffered too
    assert got == [(1, 100, 101), (2, 200, None), (9, 900, 901)]

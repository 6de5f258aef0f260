"""RocksDB state-store evidence + the transformWithStateInPandas
backend (streaming/tws.py).

100 TB rationale: the default HDFS-backed state store holds ALL keyed
state in executor heap — a 100 TB/day stream with hundreds of millions
of active keys needs the RocksDB provider (off-heap, local-disk-backed,
changelog-checkpointed). These tests prove the repo's stateful
operators produce IDENTICAL output on RocksDB vs the default provider,
so the provider is a deploy-time conf, not a semantics change.

The transformWithState parity tests are gated on ``google.protobuf``:
Spark's TWS state-server protocol is protobuf-framed and this container
has no protobuf (and no pip) — same honest environment limit as the
PIL-less compressed-image codecs (operators/multimodal.py). The
processor implementation is complete and ships; the gate documents
exactly what unlocks it.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.streaming import stateful as ST
from magshield_data_pipeline_spark.streaming import windows as W

try:  # TWS needs the protobuf wire protocol; absent in this container
    import google.protobuf.descriptor  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture
def rocksdb_state(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB)
    yield spark
    if prev is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prev)


def _events(spark, rows):
    return (
        spark.createDataFrame(rows, ["user_id", "ts", "value"])
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("event_type", F.lit("t"))
    )


def _feed(spark, batches):
    """Write each batch as one parquet file with distinct mtimes and
    return a maxFilesPerTrigger=1 stream → one micro-batch per batch."""
    import tempfile
    import time
    from pathlib import Path

    path = Path(tempfile.mkdtemp(prefix="tws_feed_"))
    schema = None
    for rows in batches:
        df = _events(spark, rows)
        schema = df.schema
        time.sleep(1.1)
        df.coalesce(1).write.mode("append").parquet(str(path))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(path))
    )


BATCH_1 = [
    (1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
    (1, datetime(2024, 1, 1, 10, 10, 0), 2.0),
    (1, datetime(2024, 1, 1, 12, 0, 0), 4.0),  # >30min → closes session 1
    (2, datetime(2024, 1, 1, 9, 0, 0), 8.0),
    (7, datetime(2024, 1, 1, 10, 0, 0), 5.0),
]
BATCH_2 = [
    # a day later: watermark sails past every batch-1 tail's end+gap
    (8, datetime(2024, 1, 2, 10, 0, 0), 1.0),
]


def _run(sessionize, stream):
    out = W.run_available_now(
        sessionize(stream, 30, watermark="10 minutes"), output_mode="append"
    ).collect()
    return sorted(map(tuple, out))


def test_sessionizer_on_rocksdb(rocksdb_state):
    """Both emit paths (in-batch closure + timer flush) run on RocksDB
    with the exact expected rows; the provider-vs-provider comparison
    lives in test_rocksdb_vs_default_provider_parity below."""
    on_rocks = _run(ST.sessionize_stateful, _feed(rocksdb_state, [BATCH_1, BATCH_2]))
    # users 1/2/7's tails flushed by the watermark; user 1's first
    # session closed in-batch; user 8's tail still open
    assert len(on_rocks) == 4
    assert {r[0] for r in on_rocks} == {1, 2, 7}
    assert on_rocks[0] == (
        1,
        datetime(2024, 1, 1, 10, 0, 0),
        datetime(2024, 1, 1, 10, 40, 0),
        2,
        3.0,
    )


def test_rocksdb_vs_default_provider_parity(spark):
    """Same feed, both providers, identical rows — run OUTSIDE the
    fixture so each query picks its provider explicitly."""
    prev = spark.conf.get(_PROVIDER_KEY, None)
    try:
        spark.conf.set(_PROVIDER_KEY, ROCKSDB)
        rocks = _run(ST.sessionize_stateful, _feed(spark, [BATCH_1, BATCH_2]))
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
        default = _run(ST.sessionize_stateful, _feed(spark, [BATCH_1, BATCH_2]))
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
    assert rocks == default and len(rocks) == 4


def test_streaming_dedup_on_rocksdb(rocksdb_state):
    """dropDuplicates state (the other built-in stateful op the repo
    registers) also runs on RocksDB with batch-distinct semantics."""
    rows = [(1, datetime(2024, 1, 1, 10, 0, 0), 1.0)] * 3 + [
        (2, datetime(2024, 1, 1, 11, 0, 0), 2.0)
    ]
    stream = _feed(rocksdb_state, [rows])
    dedup = stream.withWatermark("ts", "1 hour").dropDuplicates(
        ["user_id", "ts"]
    )
    out = W.run_available_now(dedup, output_mode="append").collect()
    assert len(out) == 2


@pytest.mark.skipif(not HAS_PROTOBUF, reason="TWS needs google.protobuf")
def test_tws_in_batch_closure(rocksdb_state):
    from magshield_data_pipeline_spark.streaming import tws as TWS

    stream = _feed(rocksdb_state, [BATCH_1[:4]])
    out = _run(TWS.sessionize_tws, stream)
    assert out == [
        (
            1,
            datetime(2024, 1, 1, 10, 0, 0),
            datetime(2024, 1, 1, 10, 40, 0),
            2,
            3.0,
        )
    ]


@pytest.mark.skipif(not HAS_PROTOBUF, reason="TWS needs google.protobuf")
def test_tws_parity_with_applyinpandaswithstate(rocksdb_state):
    """Identical multi-batch output across both stateful engines,
    covering in-batch closure AND the timer-flush path."""
    from magshield_data_pipeline_spark.streaming import tws as TWS

    a = _run(ST.sessionize_stateful, _feed(rocksdb_state, [BATCH_1, BATCH_2]))
    b = _run(TWS.sessionize_tws, _feed(rocksdb_state, [BATCH_1, BATCH_2]))
    assert a == b and len(b) == 4


@pytest.mark.skipif(not HAS_PROTOBUF, reason="TWS needs google.protobuf")
def test_tws_stale_timer_is_ignored(rocksdb_state):
    """A timer registered for an old tail must not flush a session the
    user has since extended (the multi-timer guard in
    SessionProcessor.handleExpiredTimer)."""
    from magshield_data_pipeline_spark.streaming import tws as TWS

    b1 = [(7, datetime(2024, 1, 1, 10, 0, 0), 5.0)]
    b2 = [(7, datetime(2024, 1, 1, 10, 20, 0), 2.0)]  # same session
    b3 = [(9, datetime(2024, 1, 1, 10, 45, 0), 1.0)]
    # watermark after b3 = 10:35; the stale timer expiry was 10:30, the
    # live tail's is 10:50 → the 10:30 timer fires but emits nothing
    out = _run(TWS.sessionize_tws, _feed(rocksdb_state, [b1, b2, b3]))
    assert out == []

"""The driver regenerates /root/testdata per round and has shipped
events.ts in two physical layouts so far (TIMESTAMP(NANOS) → long under
nanosAsLong; TIMESTAMP(MICROS) non-UTC-adjusted → TIMESTAMP_NTZ).
normalize_event_ts must map BOTH to the same session-TZ instant so every
downstream plan is layout-independent.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from magshield_data_pipeline_spark.sources.parquet import (
    ensure_runtime_confs,
    normalize_event_ts,
)

_INSTANT = datetime(2024, 3, 1, 12, 30, 45, 123456)
# epoch-µs built from a UTC delta, not .timestamp(), to avoid host-TZ skew
_EPOCH_US = (
    int((datetime(2024, 3, 1, 12, 30, 45) - datetime(1970, 1, 1)).total_seconds())
    * 1_000_000
    + 123_456
)


def _collect_ts(df):
    out = df.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s"))
    return [r["s"] for r in out.collect()]


def test_long_nanos_and_ntz_layouts_normalize_identically(spark):
    ensure_runtime_confs(spark)  # UTC session TZ is part of the contract
    long_df = spark.createDataFrame(
        [(_EPOCH_US * 1000,)],  # nanos-since-epoch, the nanosAsLong shape
        StructType([StructField("ts", LongType())]),
    )
    ntz_df = spark.createDataFrame(
        [(_INSTANT,)],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    got_long = _collect_ts(normalize_event_ts(long_df))
    got_ntz = _collect_ts(normalize_event_ts(ntz_df))
    assert got_long == got_ntz == ["2024-03-01 12:30:45.123456"]


def test_plain_timestamp_layout_passes_through(spark):
    ensure_runtime_confs(spark)
    df = spark.createDataFrame(
        [(_INSTANT,)], StructType([StructField("ts", TimestampType())])
    )
    normalized = normalize_event_ts(df)
    assert normalized.schema["ts"].dataType == TimestampType()
    assert _collect_ts(normalized) == ["2024-03-01 12:30:45.123456"]


def test_normalized_type_is_session_tz_timestamp(spark):
    ensure_runtime_confs(spark)
    for make in (
        lambda: spark.createDataFrame(
            [(_EPOCH_US * 1000,)], StructType([StructField("ts", LongType())])
        ),
        lambda: spark.createDataFrame(
            [(_INSTANT,)], StructType([StructField("ts", TimestampNTZType())])
        ),
    ):
        assert normalize_event_ts(make()).schema["ts"].dataType == TimestampType()

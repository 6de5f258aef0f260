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


# ---------------------------------------------------------------------------
# Hilbert curve properties (r5)


def test_hilbert_is_bijective_and_adjacent(spark):
    # THE Hilbert property Morton lacks: consecutive indexes are always
    # Manhattan-adjacent cells; and the map is a bijection on the grid
    from magshield_data_pipeline_spark.operators import layout as L
    import pyspark.sql.functions as F

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        r["_hkey"]: (r["x"], r["y"])
        for r in L.with_hilbert(df, "x", "y", bits=3).collect()
    }
    assert sorted(got) == list(range(64))  # bijective on the 8x8 grid
    for d in range(63):
        (x1, y1), (x2, y2) = got[d], got[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, got[d], got[d + 1])


def test_hilbert_envelopes_not_worse_than_morton(spark):
    # on identical dims and bucket count, the summed per-bucket
    # envelope area of the Hilbert layout must not exceed Morton's —
    # the locality claim, measured on the real fixture
    from magshield_data_pipeline_spark.operators import layout as L
    import pyspark.sql.functions as F
    from magshield_data_pipeline_spark.sources.parquet import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    dims = orders.select(
        (F.col("o_custkey") % 4096).cast("long").alias("x"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")) % 4096
        ).cast("long").alias("y"),
    )

    def area(stats):
        return sum(
            (r["x_max"] - r["x_min"] + 1) * (r["y_max"] - r["y_min"] + 1)
            for r in stats.collect()
        )

    hil = area(L.hilbert_bucket_stats(dims, "x", "y", bits=12, n_buckets=16))
    mor = area(L.zorder_bucket_stats(dims, "x", "y", bits=12, n_buckets=16))
    assert hil <= mor, (hil, mor)


def test_hilbert_plan_is_projection_plus_one_agg(spark):
    from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY

    df = QUERY_REGISTRY["hilbert_layout_stats"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    assert shuffles <= 1, plan[:2000]
    assert "Sort" not in plan
    # (no WholeStageCodegen assert: the AdaptiveSparkPlan pre-final
    # string omits codegen spans; the shape asserts above are the
    # load-bearing ones)


def test_hilbert_full_width_16_bits(spark):
    # the default 16-bit width must plan in bounded time (CollapseProject
    # stops at multiply-referenced exprs, so the projection chain stays
    # linear) and agree with the reference recurrence at the corners
    from magshield_data_pipeline_spark.operators import layout as L

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(123, 4567), (65535, 0), (0, 65535), (32768, 32767)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["_hkey"]
        for r in L.with_hilbert(df, "x", "y", bits=16).collect()
    }
    assert got == {(x, y): xy2d(65536, x, y) for x, y in pts}

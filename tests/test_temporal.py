"""As-of / range join tests (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import temporal as TP


def _ts(m, s=0, us=0):
    return datetime(2024, 1, 1, 10, m, s, us)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 101.0), (2, _ts(15), 50.0),
         (3, _ts(5), 9.0)],
        ["k", "ts", "price"],
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [(1, _ts(8), 99.5), (1, _ts(10), 99.9), (1, _ts(19), 100.5),
         (2, _ts(30), 49.0)],
        ["k", "ts", "bid"],
    )


def test_asof_backward_inclusive(trades, quotes):
    out = {(r.k, r.ts): r for r in TP.as_of_join(trades, quotes, on="k").collect()}
    # trade at 10:10 matches the quote at exactly 10:10 (boundary inclusive)
    assert out[(1, _ts(10))].asof_bid == 99.9
    # trade at 10:20 matches the 10:19 quote (latest ≤)
    assert out[(1, _ts(20))].asof_bid == 100.5
    # key 2's only quote is later than the trade → no match
    assert out[(2, _ts(15))].asof_bid is None
    # key 3 has no quotes at all → no match, row preserved
    assert out[(3, _ts(5))].asof_bid is None
    assert len(out) == 4  # left rows preserved exactly


def test_asof_tolerance(trades, quotes):
    out = {
        (r.k, r.ts): r
        for r in TP.as_of_join(trades, quotes, on="k", tolerance_seconds=30).collect()
    }
    # 10:20 trade vs 10:19 quote: 60 s back > 30 s tolerance → dropped
    assert out[(1, _ts(20))].asof_bid is None
    # exact-time match survives any tolerance
    assert out[(1, _ts(10))].asof_bid == 99.9


def test_range_join_window(spark, trades, quotes):
    out = TP.range_join(
        trades, quotes.select(F.col("k").alias("k2"), F.col("ts").alias("qts"), "bid"),
        on="k", left_ts="ts", right_ts="qts", right_on="k2",
        lower=F.expr("INTERVAL -2 MINUTES"), upper=F.expr("INTERVAL 0 MINUTES"),
    ).collect()
    # matches within [ts-2min, ts]: trade 10:10 → quotes 10:08 & 10:10
    k1 = [r for r in out if r.k == 1 and r.ts == _ts(10) and r.bid is not None]
    assert sorted(r.bid for r in k1) == [99.5, 99.9]


# ---------------------------------------------------------------------------
# keyless bucketed interval join (r6)


def test_interval_bucket_join_equals_naive_range_join(spark):
    import random

    rng = random.Random(7)
    ivs = [(i, rng.randrange(0, 200), rng.randrange(0, 25)) for i in range(40)]
    intervals = spark.createDataFrame(
        [(i, s, s + ln) for i, s, ln in ivs], "iv_id long, s long, e long"
    )
    points = spark.createDataFrame(
        [(j, rng.randrange(-10, 230)) for j in range(300)],
        "pt_id long, t long",
    )
    got = sorted(
        (r["iv_id"], r["pt_id"])
        for r in TP.interval_bucket_join(
            intervals, points, "s", "e", "t", bucket_ticks=10
        ).collect()
    )
    naive = sorted(
        (r["iv_id"], r["pt_id"])
        for r in intervals.crossJoin(points)
        .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
        .collect()
    )
    assert got == naive and len(naive) > 0
    # exactly once per qualifying pair — no bucket-overlap duplicates
    assert len(got) == len(set(got))


def test_interval_bucket_join_boundaries_and_degenerates(spark):
    intervals = spark.createDataFrame(
        [(1, 10, 20), (2, 15, 15), (3, 30, 25)],  # 3: end < start → empty
        "iv_id long, s long, e long",
    )
    points = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 15), (4, 9), (5, 21), (6, 27)],
        "pt_id long, t long",
    )
    got = sorted(
        (r["iv_id"], r["pt_id"])
        for r in TP.interval_bucket_join(
            intervals, points, "s", "e", "t", bucket_ticks=4
        ).collect()
    )
    # closed interval: both boundary points included; single-tick
    # interval matches exactly its tick; inverted interval matches none
    assert got == [(1, 1), (1, 2), (1, 3), (2, 3)]

    import pytest as _pt

    with _pt.raises(ValueError):
        TP.interval_bucket_join(intervals, points, "s", "e", "t", 0)


def test_interval_bucket_join_property_random_grids(spark):
    # hypothesis-style sweep without per-example Spark jobs being too
    # slow: several deterministic seeds × bucket widths, each asserted
    # against the naive cross+filter — bucket width must NEVER change
    # the result (including widths larger than every interval and
    # width 1)
    import random

    for seed, bucket in [(1, 1), (2, 3), (3, 10), (4, 100), (5, 7)]:
        rng = random.Random(seed)
        intervals = spark.createDataFrame(
            [
                (i, s, s + rng.randrange(0, 15))
                for i, s in enumerate(rng.sample(range(120), 20))
            ],
            "iv_id long, s long, e long",
        )
        points = spark.createDataFrame(
            [(j, rng.randrange(-5, 140)) for j in range(80)],
            "pt_id long, t long",
        )
        got = sorted(
            (r["iv_id"], r["pt_id"])
            for r in TP.interval_bucket_join(
                intervals, points, "s", "e", "t", bucket_ticks=bucket
            ).collect()
        )
        naive = sorted(
            (r["iv_id"], r["pt_id"])
            for r in intervals.crossJoin(points)
            .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
            .collect()
        )
        assert got == naive, f"seed={seed} bucket={bucket}"
        assert len(got) == len(set(got)), "duplicate pair emitted"

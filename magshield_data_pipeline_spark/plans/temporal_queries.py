"""Temporal join queries over ``events`` ([EXT]): as-of join and
bounded range join — the event-analytics operators the reference lacks
(SURVEY §2.5 notes no theta/range/as-of joins exist there).

DuckDB has a native ASOF JOIN, which makes the oracle a direct
statement of the semantics our union+window composition implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import temporal as TP
from magshield_data_pipeline_spark.plans.registry import register
from magshield_data_pipeline_spark.sources.parquet import read_table

_TS = "%Y-%m-%d %H:%M:%S.%f"

_ASOF_SQL = f"""
WITH p AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (  -- one click per (user, ts): highest event_id wins (determinism)
    SELECT user_id, ts, max(event_id) AS click_id
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, ts
)
SELECT
    p.user_id,
    p.event_id,
    strftime(p.ts, '{_TS}') AS purchase_ts,
    c.click_id AS asof_click_id,
    strftime(c.ts, '{_TS}') AS asof_click_ts
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register(
    "purchase_asof_click",
    sql=_ASOF_SQL,
    description="as-of join: each purchase attaches the latest click at or "
    "before it per user — union+window composition, one shuffle ([EXT] "
    "temporal; DuckDB native ASOF JOIN as the oracle)",
)
def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one shuffle on user_id; per-key state during the sort is a
    # single carried row — no per-key collection, any right-side volume.
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = TP.as_of_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["click_id"],
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("asof_click_id"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_click_ts"),
    )


_RANGE_SQL = """
SELECT
    s.event_id,
    s.user_id,
    count(c.event_id) AS n_clicks_10m
FROM events s
LEFT JOIN events c
    ON c.user_id = s.user_id
   AND c.event_type = 'click'
   AND c.ts >= s.ts
   AND c.ts <= s.ts + INTERVAL '10 minutes'
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.user_id
"""


@register(
    "signup_click_burst",
    sql=_RANGE_SQL,
    description="bounded range join: clicks within 10 minutes after each "
    "signup, per user ([EXT] temporal interval join)",
)
def signup_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equi key (user_id) carries the join; the interval is a post-join
    # filter — the right plan while keys are selective. AQE handles any
    # hot user.
    events = read_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    joined = signups.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("ts"))
        & (F.col("c_ts") <= F.col("ts") + F.expr("INTERVAL 10 MINUTES")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_id").alias("n_clicks_10m")
    )


# ---------------------------------------------------------------------------
# keyless interval join via time bucketing (registered r6)

_IVJ_SQL = """
WITH u AS (
    SELECT o_orderkey,
           datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS dd
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_custkey % 100 = 0
),
l AS (
    SELECT l_quantity,
           datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS sd
    FROM lineitem
)
SELECT u.o_orderkey,
       CAST(count(*) AS BIGINT) AS n_shipments,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM u JOIN l ON l.sd BETWEEN u.dd AND u.dd + 7
GROUP BY 1
"""


@register(
    "orderdate_shipment_window",
    sql=_IVJ_SQL,
    description="KEYLESS interval-containment join, bucketed: market-wide "
    "shipment activity in the week after each urgent order's date — no "
    "equi key exists, so the naive plan is a BroadcastNestedLoopJoin "
    "(quadratic compare); interval_bucket_join maps both sides onto a "
    "7-day grid and turns it into an equi join on the bucket id with "
    "exact containment as a post-filter, each qualifying pair emitted "
    "exactly once ([EXT] temporal tier — the scale path range_join's "
    "docstring promises for keyless ranges)",
)
def orderdate_shipment_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: per-bucket pair cost is |intervals_b| x |points_b| — the
    # interval side is filtered to a sparse order subset BEFORE the
    # explode (predicate pushdown shrinks the fan-out side), and the
    # bucket grid (7 days = the window width) gives each interval <= 2
    # bucket rows. The day-number clock is integer arithmetic end to
    # end — no timestamp-zone pitfalls in either engine.
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    epoch = F.lit("1992-01-01")
    intervals = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_custkey") % 100 == 0)
        )
        .select(
            "o_orderkey",
            F.datediff(F.to_date("o_orderdate"), epoch).cast("long").alias("dd"),
        )
        .withColumn("dd_end", F.col("dd") + 7)
    )
    points = lineitem.select(
        "l_quantity",
        F.datediff(F.to_date("l_shipdate"), epoch).cast("long").alias("sd"),
    )
    joined = TP.interval_bucket_join(
        intervals, points,
        start_tick="dd", end_tick="dd_end", point_tick="sd",
        bucket_ticks=7,
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# linear multi-touch attribution (registered r6)

_ATTR_SQL = """
WITH purchases AS (
    SELECT event_id AS p_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT event_id AS c_id, user_id, ts AS c_ts
    FROM events WHERE event_type = 'click'
),
touch AS (
    SELECT p.p_id, p.user_id, c.c_id,
           count(*) OVER (PARTITION BY p.p_id) AS n_touches
    FROM purchases p
    JOIN clicks c
      ON c.user_id = p.user_id
     AND c.c_ts <= p.p_ts
     AND c.c_ts >= p.p_ts - INTERVAL '7 days'
)
SELECT c_id AS click_id,
       CAST(count(*) AS BIGINT) AS n_conversions,
       round(sum(round(1.0 / n_touches, 9)), 9) AS credit
FROM touch GROUP BY 1
"""


@register(
    "linear_attribution_credit",
    sql=_ATTR_SQL,
    description="linear multi-touch attribution: each purchase splits one "
    "unit of credit equally across the same user's clicks in the prior "
    "7 days, rolled up per click — the marketing-analytics composite of "
    "a bounded range join + per-conversion count + credit re-aggregation; "
    "1/n credits rounded to 9 decimals BEFORE summation (quantized-"
    "addend discipline) so the rollup is engine-exact",
)
def linear_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the touch join keys on user_id with a bounded two-sided
    # time window (the range_join shape); n_touches is a count window
    # over the TOUCH frame partitioned by purchase (never raw events);
    # the final rollup partial-aggregates per click.
    from pyspark.sql.window import Window

    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touch = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).withColumn(
        "n_touches", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    )
    return touch.groupBy(F.col("c_id").alias("click_id")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum(F.round(F.lit(1.0) / F.col("n_touches"), 9)), 9).alias(
            "credit"
        ),
    )


# ---------------------------------------------------------------------------
# [EXT] time-series regularization: dense daily grid + LOCF fill (r8)

_LOCF_EVERY = 97  # sparse observation subset: ~1% of events → real gaps

_LOCF_SQL = f"""
WITH sparse AS (
    SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 2) AS v
    FROM events WHERE event_id % {_LOCF_EVERY} = 0
    GROUP BY 1, 2
),
span AS (
    SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
    FROM events
),
grid AS (
    SELECT t.event_type, CAST(g.day AS DATE) AS day
    FROM (SELECT DISTINCT event_type FROM events) t, span s,
         unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                                CAST(s.d1 AS TIMESTAMP),
                                INTERVAL 1 DAY)) AS g(day)
)
SELECT g.event_type,
       strftime(g.day, '%Y-%m-%d') AS day,
       round(coalesce(
           last_value(sp.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           0.0), 2) AS value_filled,
       sp.v IS NULL AS was_gap
FROM grid g
LEFT JOIN sparse sp ON sp.event_type = g.event_type AND sp.day = g.day
"""


@register(
    "gap_fill_locf_daily",
    sql=_LOCF_SQL,
    description="time-series regularization: sparse per-type daily sums "
    "re-indexed onto the dense [min_day, max_day] grid with last-"
    "observation-carried-forward fill (leading gaps default 0) — the "
    "resample+ffill step feature pipelines run before training; grid "
    "from one exploded span row (broadcast), fill is one running "
    "rows-window per key ([EXT] temporal tier)",
)
def gap_fill_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the sparse/span/keys rollups each partial-aggregate off
    # the fact scan before their (tiny) exchanges; the per-key LOCF
    # window runs over the bounded |types| x |days| grid, which builds
    # from a broadcast cross join of one exploded single-row span
    # frame — no data-proportional shuffle beyond the input rollups.
    events = read_table(spark, sf_dir, "events")
    sparse = (
        events.filter(F.col("event_id") % _LOCF_EVERY == 0)
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    span = events.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    keys = events.select("event_type").distinct()
    filled = TP.gap_fill_locf(
        sparse, keys, span,
        key_col="event_type", day_col="day", val_col="v",
    )
    return filled.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("value_filled", 2).alias("value_filled"),
        "was_gap",
    )

"""Temporal join operators: as-of join and bounded range join.

The reference has no temporal joins (SURVEY §2.5 "no theta/range/as-of
joins exist"); these are the [EXT]-tier operators an event-data user of
the engine needs. Spark has no built-in as-of join, so it is composed
from existing DataFrame ops (the preferred strategy for custom
operators) rather than a pandas cogroup:

- **as_of_join**: union both sides tagged by origin, sort per key by
  (event time, origin), and carry the right side's payload forward with
  ``last_value(..., ignorenulls)``. ONE shuffle on the join key, state
  is a single row per partition-sort — this scales to arbitrarily many
  right rows per key, unlike collecting the right side per key. The
  pandas alternative (cogroup + merge_asof) moves both sides through
  Python; this stays entirely JVM-side.
- **range_join**: equi-key + time-interval predicate — Spark executes
  the equi part as the join key and the range as a post-join filter,
  which is the right plan when the equi key is selective (per-user
  windows). For keyless range joins, bucketize time and join on the
  bucket (not needed for the reference surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the LAST right row with
    ``right_ts <= left_ts`` on the same key (backward as-of, boundary
    inclusive — ties resolve to the right row, matching DuckDB/pandas
    ``merge_asof`` semantics). Optional tolerance drops matches older
    than ``tolerance_seconds``.

    Right payload column names must not collide with left columns
    (alias first)."""
    payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # both union branches carry the identical column set: the left
    # row's own columns, the event time, an origin tag, and the right
    # payload (null on left-origin rows)
    left_cols = [c for c in left.columns]
    lhs = left.select(
        *left_cols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_match_ts"),
    )
    rhs = right.select(
        *[
            F.col(c) if c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),  # right sorts before left at equal ts
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        F.col(right_ts).alias("_match_ts"),
    )
    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        "_t",
        "_src",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in payload
        ],
        F.last("_match_ts", ignorenulls=True).over(w).alias("_match_ts"),
    ).filter(F.col("_src") == 1)
    if tolerance_seconds is not None:
        in_tol = F.col("_match_ts") >= F.col("_t") - F.expr(
            f"INTERVAL {tolerance_seconds} SECONDS"
        )
        carried = carried.select(
            *left_cols,
            "_t",
            *[
                F.when(in_tol, F.col(f"_r_{c}")).alias(f"_r_{c}")
                for c in payload
            ],
            F.when(in_tol, F.col("_match_ts")).alias("_match_ts"),
        )
    return carried.select(
        *left_cols,
        *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in payload],
        F.col("_match_ts").alias("asof_ts"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    how: str = "left",
    right_on: str | None = None,
) -> DataFrame:
    """Equi-key join with a time-window predicate: right rows whose
    timestamp lies in [left_ts + lower, left_ts + upper]. ``right_on``
    names the right side's key when it was aliased (avoids ambiguous
    column names in the result)."""
    cond = (
        (left[on] == right[right_on or on])
        & (right[right_ts] >= left[left_ts] + lower)
        & (right[right_ts] <= left[left_ts] + upper)
    )
    return left.join(right, cond, how)


def interval_bucket_join(
    intervals: DataFrame,
    points: DataFrame,
    start_tick: str,
    end_tick: str,
    point_tick: str,
    bucket_ticks: int,
) -> DataFrame:
    """KEYLESS interval-containment join (point ∈ [start, end]) made
    scale-safe by time bucketing — the case :func:`range_join` cannot
    handle: with no equi key, Spark plans a pure range predicate as
    BroadcastNestedLoopJoin (quadratic compare, broadcast of a whole
    side). Instead, both sides are mapped onto a shared time grid:
    each interval explodes to the buckets it overlaps
    (``sequence(start div b, end div b)``), each point hashes to its
    single bucket, and the join becomes an EQUI join on the bucket id
    with the exact containment test as a cheap post-join filter.

    Every qualifying (interval, point) pair appears exactly once — the
    point lives in one bucket, so no dedup pass is needed (the reason
    points, not intervals, keep the single bucket).

    All tick columns are LONGs on a caller-chosen clock (epoch
    seconds, days-since-epoch, …): converting once at the call site
    keeps this operator free of timestamp-type pitfalls and makes the
    grid explicit. Pick *bucket_ticks* ≈ the typical interval length:
    fan-out per interval is ``len/bucket + 1`` rows, and per-bucket
    pair cost is |intervals_b|·|points_b| — the same
    blocking-selectivity contract as LSH bands and linkage blocks.
    Intervals with ``end < start`` are dropped (empty by definition).
    """
    if bucket_ticks <= 0:
        raise ValueError("bucket_ticks must be positive")
    b = F.lit(bucket_ticks)
    iv = (
        intervals.filter(F.col(end_tick) >= F.col(start_tick))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_tick) / b), F.floor(F.col(end_tick) / b)
                )
            ),
        )
    )
    pt = points.withColumn("_bkt", F.floor(F.col(point_tick) / b))
    return (
        iv.join(pt, "_bkt")
        .filter(
            (F.col(point_tick) >= F.col(start_tick))
            & (F.col(point_tick) <= F.col(end_tick))
        )
        .drop("_bkt")
    )


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time they
    completed each stage IN ORDER — stage i+1 counts only at or after
    the user's stage-i time (the strict product-analytics definition,
    not mere per-stage presence). Returns one row per user who entered
    the funnel, with nullable ``t0..t{n-1}`` stage timestamps.

    Scale: one shuffle on the user key per stage (k is small and
    fixed); each step is a join against a single filtered event-type
    slice followed by a partial-aggregated min — per-user state is one
    timestamp, never an event list, so hot users cost nothing extra."""
    reached = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, stage in enumerate(stages[1:], start=1):
        nxt = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t")
        )
        cond = (reached[user_col] == nxt["_u"]) & (
            nxt["_t"] >= reached[f"t{i - 1}"]
        )
        reached = (
            reached.join(nxt, cond, "left")
            .groupBy(*[F.col(c) for c in reached.columns])
            .agg(F.min("_t").alias(f"t{i}"))
        )
    return reached


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stage-reach rollup of :func:`funnel_stage_times`: one row per
    stage with the number of users whose ordered journey reached it.
    ``count(t_i)`` skips nulls, so each row counts exactly the users
    with a complete in-order prefix through stage i."""
    times = funnel_stage_times(events, stages, user_col, ts_col, type_col)
    agg = times.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(len(stages))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def gap_fill_locf(
    sparse: DataFrame,
    keys: DataFrame,
    span: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
    val_col: str = "value",
    default: float = 0.0,
) -> DataFrame:
    """Regularize a sparse per-(key, day) series onto a dense daily
    grid with last-observation-carried-forward fill — the resample +
    ffill step every time-series feature pipeline runs before
    training, which the reference (like Spark) has no operator for.

    *keys* is a one-column frame of grid keys; *span* is a ONE-ROW
    frame with columns ``d0``/``d1`` (inclusive date bounds).  Output:
    (key, day, value_filled, was_gap) for every grid cell, where
    ``value_filled`` carries the last observed value forward per key
    and leading gaps (before the first observation) take *default*.

    Scale shape: the day axis explodes from the single span row
    (``sequence``), so the grid build is a broadcast cross join of
    |keys| rows x |days| — never a shuffle; the observed values attach
    with ONE left join keyed (key, day); LOCF is ONE running window
    per key (rows-frame ``last(ignorenulls)``, no sort spill beyond
    |days| rows per key).  Exchange budget: each caller-supplied
    input that derives from a fact scan (sparse rollup, span, keys)
    partial-aggregates before its shuffle, and the window adds one
    exchange over the BOUNDED grid — so the only data-proportional
    shuffles are the callers' own rollups (plan-pinned in
    tests/test_plan_shapes.py::test_gap_fill_locf_exchange_budget).
    """
    days = span.select(
        F.explode(F.sequence("d0", "d1")).alias(day_col)
    )
    grid = keys.crossJoin(F.broadcast(days))
    joined = grid.join(sparse, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(val_col, ignorenulls=True).over(w)
    return joined.select(
        key_col,
        day_col,
        F.coalesce(filled, F.lit(default)).alias("value_filled"),
        F.col(val_col).isNull().alias("was_gap"),
    )

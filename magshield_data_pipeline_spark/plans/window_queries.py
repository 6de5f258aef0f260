"""Event-time window queries over ``events`` (SURVEY §2.10 [EXT]):
tumbling, sliding, session windows; exact + approximate distinct; and a
Structured Streaming run oracle-checked against the same SQL as batch
(stream/batch parity via Trigger.AvailableNow).

Window-alignment parity: Spark's ``window()`` aligns to the epoch,
DuckDB's ``time_bucket`` to 2000-01-01 — both midnight-aligned, so
hour/minute buckets coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.plans.registry import register
from magshield_data_pipeline_spark.sources.parquet import read_table
from magshield_data_pipeline_spark.streaming import windows as W

_TUMBLING_SQL = """
SELECT
    strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
    event_type,
    count(*) AS n_events,
    round(sum(value), 2) AS value_sum
FROM events
GROUP BY 1, 2
"""


@register(
    "tumbling_window_rollup",
    sql=_TUMBLING_SQL,
    description="tumbling 1-hour event-time windows per event_type (EXT-5)",
)
def tumbling_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: single shuffle on (window, event_type) — bounded
    # cardinality; partial aggregation collapses events map-side.
    events = read_table(spark, sf_dir, "events")
    return W.tumbling_counts(events, "1 hour")


_SLIDING_SQL = """
WITH buckets AS (
    SELECT
        unnest([time_bucket(INTERVAL '5 minutes', ts),
                time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws,
        value
    FROM events
)
SELECT
    strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
    strftime(ws + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
    count(*) AS n_events,
    round(sum(value), 2) AS value_sum
FROM buckets
GROUP BY 1, 2
"""


@register(
    "sliding_window_activity",
    sql=_SLIDING_SQL,
    description="sliding 10-minute windows every 5 minutes: each event lands "
    "in width/slide windows (EXT-5)",
)
def sliding_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle states the semantics directly: an event belongs to the
    # two 5-minute-aligned windows that contain it.
    events = read_table(spark, sf_dir, "events")
    return W.sliding_user_activity(events, "10 minutes", "5 minutes")


_SESSION_SQL = """
WITH o AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
m AS (
    -- Spark merges an event at exactly prev+gap into the session
    -- (boundary inclusive): a new session needs a STRICTLY larger gap
    SELECT user_id, ts, value,
           CASE WHEN prev IS NULL OR ts > prev + INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_session
    FROM o
),
g AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM m
)
SELECT
    user_id,
    strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
    strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
    count(*) AS n_events,
    round(sum(value), 2) AS value_sum
FROM g GROUP BY user_id, session_id
"""


@register(
    "session_window_rollup",
    sql=_SESSION_SQL,
    description="session windows per user, 30-minute inactivity gap; the "
    "oracle is the equivalent gaps-and-islands SQL (EXT-5)",
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window end = last event + gap; a new session starts when
    # the gap to the previous event is >= 30 min (window end exclusive).
    # Scale: shuffle on user_id; state per open session only when run
    # as a stream (watermark bounds it).
    events = read_table(spark, sf_dir, "events")
    return W.session_windows(events, "30 minutes")


@register(
    "distinct_users_per_type",
    sql="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    description="exact distinct-user count per event type (EXT-6 exact twin)",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


_HLL_RSD = 0.02


@register(
    "approx_distinct_users",
    sql="""
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events, TRUE AS within_tolerance
    FROM events GROUP BY event_type
    """,
    description="approx_count_distinct (HLL) users per event type (EXT-6). "
    "HLL sketch values are engine-specific, so the hash-checkable contract "
    "is a bounds check: Spark emits the exact count plus a boolean "
    "|approx - exact| / exact <= 3*rsd, the oracle emits the same exact "
    "count and TRUE",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # At 100 TB this replaces the exact twin: no per-key distinct state,
    # one pass, fixed-size sketches merged map-side. The exact count
    # rides along only to make the approximation oracle-checkable.
    events = read_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )
    tol = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= 3 * _HLL_RSD
    )
    return agg.select(
        "event_type", "exact_users", "n_events", tol.alias("within_tolerance")
    )


@register(
    "streaming_tumbling_counts",
    sql=_TUMBLING_SQL,
    description="Structured Streaming run of the tumbling rollup "
    "(readStream → watermark → window → memory sink, Trigger.AvailableNow); "
    "oracle-checked against the SAME SQL as the batch path (EXT-5)",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream/batch parity is the check: the identical transformation
    # over readStream must produce the batch answer once every available
    # file is processed.
    stream = W.read_events_stream(spark, sf_dir)
    # no_data_batch=False (r13): complete-mode output REPLACES the
    # memory table each batch and the advance batch re-emits the
    # identical aggregate (no new data, windows never finalize in
    # complete mode) — skipping it cannot change the table
    return W.run_available_now(
        W.tumbling_counts(stream, "1 hour"), state_partitions=8,
        no_data_batch=False,
    )


# emitted set under a far-future watermark: every session proven closed
# by a LATER same-user event — i.e. all sessions except each user's
# open tail (max session_id per user). Timeout-flushed tails are
# covered by tests/test_streaming.py with a two-batch stream.
_STATEFUL_SESSION_SQL = """
WITH o AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
m AS (
    SELECT user_id, ts, value,
           CASE WHEN prev IS NULL OR ts > prev + INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_session
    FROM o
),
g AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM m
),
agg AS (
    SELECT user_id, session_id,
           min(ts) AS s, max(ts) AS e,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM g GROUP BY user_id, session_id
)
SELECT
    user_id,
    strftime(s, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
    strftime(e + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
    n_events,
    value_sum
FROM agg
QUALIFY session_id < max(session_id) OVER (PARTITION BY user_id)
"""


@register(
    "stateful_sessionizer",
    sql=_STATEFUL_SESSION_SQL,
    description="custom stateful operator: applyInPandasWithState "
    "sessionizer (explicit keyed state + event-time timeout) run via "
    "Trigger.AvailableNow; oracle = gaps-and-islands SQL minus each "
    "user's open tail session (EXT-5)",
)
def stateful_sessionizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The far-future watermark makes the emitted set deterministic
    # (same-user-proven closures only), which is what makes this
    # stateful operator oracle-checkable at all; production uses the
    # default 10-minute delay and gets timeout-flushed tails too.
    from magshield_data_pipeline_spark.streaming import stateful as ST

    stream = W.read_events_stream(spark, sf_dir)
    sessions = ST.sessionize_stateful(stream, gap_minutes=30, watermark="3650 days")
    # state store sized to the keyspace (~3k users → ~375/partition),
    # like every other streaming row; run_available_now additionally
    # caps it at the session's parallelism.  The contested r12 pin was
    # re-adjudicated r13 (VERDICT item 3) with a fresh-PROCESS
    # interleaved A/B, 5 trials per value per core count: at 32 cores
    # 8-vs-32 partitions is a tie (warm med 4.1 vs 3.9 s, cold 12.4 vs
    # 12.0 — neither the r12 builder's "8 wins 5.3 vs 8.1" nor the
    # driver's implied regression reproduces cold); at 8 cores 8
    # partitions wins ~1.8x (warm 3.5 vs 6.5 s) — per-partition state
    # files + Python worker rounds dominate once partitions outnumber
    # cores.  Keyspace-sized 8 stands; full table in OPTIMIZATION_r13.md.
    #
    # no_data_batch=False (r13): THIS query's emission cannot depend on
    # the trailing watermark-advance batch — the 3650-day watermark
    # delay puts the post-drain watermark ~10 years before every
    # session end, so the EventTimeTimeout flush can never fire within
    # the drain (that suppression is the query's documented contract:
    # only same-user-proven closures emit, open tails are excluded by
    # the oracle).  The advance batch only re-ran the stateful plan
    # over all 3k state rows and emitted nothing.  The production
    # 10-minute-delay configuration keeps the default — the knob is
    # per-call.
    out = W.run_available_now(sessions, output_mode="append",
                              state_partitions=8, no_data_batch=False)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        "n_events",
        "value_sum",
    )


@register(
    "streaming_dedup_pairs",
    sql="SELECT DISTINCT user_id, event_type FROM events",
    description="Structured Streaming deduplication: readStream → "
    "dropDuplicates(user_id, event_type) → append-mode memory sink under "
    "Trigger.AvailableNow; oracle = batch DISTINCT over the same rows "
    "(EXT-5)",
)
def streaming_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream/batch parity is the check: once every available file is
    # processed, streaming dedup must equal batch DISTINCT. Scale:
    # state is one entry per live key; production expiry via
    # dropDuplicatesWithinWatermark (see streaming/windows.py).
    stream = W.read_events_stream(spark, sf_dir)
    # dropDuplicates emits each key on FIRST sight within the data
    # batch; the trailing no-data watermark batch only re-ran the
    # stateful plan over 15k state rows without emitting anything
    # (measured r12) — skip it
    return W.run_available_now(
        W.dedup_stream(stream),
        output_mode="append",
        state_partitions=8,
        no_data_batch=False,
    )


@register(
    "sharded_hll_union",
    sql="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT user_id % 8) AS BIGINT) AS n_shards
    FROM events
    """,
    description="shard-mergeable distinct counting: per-shard Datasketches "
    "HLL sketches (hll_sketch_agg) unioned at query time "
    "(hll_union_agg → estimate) — the pre-aggregated-sketch pattern a "
    "100 TB pipeline uses so distinct counts never re-scan raw data. "
    "Sketch bytes and the estimate are engine-specific, so the hash-"
    "checked columns are exact_users + the realized shard count; the "
    "5% estimate-tolerance assertion lives in the local test "
    "(tests/test_ext_operators.py), not the cross-engine hash "
    "(ADVICE r4: hardcoded n_shards/TRUE could break spuriously)",
)
def sharded_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The two-level shape is the point: level 1 builds one fixed-size
    # sketch per shard (in production: per partition/day, materialized
    # alongside the data); level 2 answers the global question by
    # merging the sketches — no raw-data re-scan. The merged estimate
    # feeds a driver-visible sanity bound (fail loud if the sketch path
    # collapses) but is NOT an output column: HLL bytes differ by
    # engine, and a live ±5% check in hashed output is flake by design.
    events = read_table(spark, sf_dir, "events")
    sketches = events.groupBy((F.col("user_id") % 8).alias("shard")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count("*").alias("n_shards"),
    )
    exact = events.agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        exact.crossJoin(merged)
        # a merged estimate of 0/null with a nonzero exact count means
        # the sketch-union path silently broke — fail the row out
        # rather than report a hash-matching but meaningless answer
        .filter(
            (F.col("exact_users") == 0) | (F.coalesce("approx_users", F.lit(0)) > 0)
        )
        .select("exact_users", "n_shards")
    )


# ---------------------------------------------------------------------------
# windowed top-k (registered r5)

_WINDOW_TOPK_K = 3

_WINDOW_TOPK_SQL = f"""
WITH c AS (
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
r AS (
    SELECT window_start, event_type, n_events,
           row_number() OVER (
               PARTITION BY window_start ORDER BY n_events DESC, event_type
           ) AS rnk
    FROM c
)
SELECT window_start, CAST(rnk AS BIGINT) AS rnk, event_type, n_events
FROM r WHERE rnk <= {_WINDOW_TOPK_K}
"""


@register(
    "windowed_top_events",
    sql=_WINDOW_TOPK_SQL,
    description=f"top-{_WINDOW_TOPK_K} event types per tumbling 1-day "
    "window with a total-order tiebreak — the windowed heavy-hitters "
    "shape (dashboard/trending feeds); partial-agg counts, then a "
    "WindowGroupLimit-prunable ranking per window",
)
def windowed_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: counts collapse map-side before the exchange; the ranking
    # partitions by window (bounded rows per partition after the agg),
    # and Spark's WindowGroupLimit prunes to k before the final shuffle.
    from pyspark.sql.window import Window as Wnd

    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Wnd.partitionBy("w").orderBy(F.col("n_events").desc(), F.col("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _WINDOW_TOPK_K)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col("rnk").cast("long").alias("rnk"),
            "event_type",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters (registered r5)

from magshield_data_pipeline_spark.operators import sketches as SK  # noqa: E402

_CMS_SHARDS = 4


def _cms_sketch_sql() -> str:
    """Depth-row union: one GROUP BY per depth row (DuckDB side; the
    Spark side fans depth out in a single scan — the oracle trades
    scans for clarity, at sf0.01 that's free)."""
    parts = [
        f"SELECT {d} AS d, {SK.cms_bucket_sql('event_type', d)} AS bucket,\n"
        f"       CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 2"
        for d in range(SK.CMS_DEPTH)
    ]
    return "\nUNION ALL\n".join(parts)


_CMS_SQL = f"""
WITH sk AS (
{_cms_sketch_sql()}
),
keys AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS exact_count
    FROM events GROUP BY 1
),
probe AS (
    SELECT k.event_type, k.exact_count, min(sk.cnt) AS est_count
    FROM keys k
    JOIN sk ON {" OR ".join(
        f"(sk.d = {d} AND sk.bucket = {SK.cms_bucket_sql('k.event_type', d)})"
        for d in range(SK.CMS_DEPTH)
    )}
    GROUP BY 1, 2
)
SELECT event_type, est_count, exact_count,
       est_count - exact_count AS overestimate
FROM probe
"""


@register(
    "cms_heavy_hitters",
    sql=_CMS_SQL,
    description="Count-Min Sketch frequency estimates vs exact counts: "
    f"per-shard {SK.CMS_DEPTH}x{SK.CMS_WIDTH} sketches built in one scan, "
    "merged cell-wise (linearity = exact mergeability), point-queried for "
    "every event_type; overestimate >= 0 is the CMS guarantee. The "
    "mergeable-frequency twin of sharded_hll_union (distinct) — md5-"
    "bucketed so sketch cells hash-match across engines ([EXT] sketch "
    "tier; Cormode & Muthukrishnan 2005)",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The two-level shape mirrors the HLL query: level 1 builds one
    # fixed-size sketch per shard from a SINGLE scan (groupBy shard,d,
    # bucket — in production these persist next to the data); level 2
    # answers global frequency questions from the merged sketch without
    # re-scanning raw data. The probe side broadcasts the ≤512-row
    # sketch; exact counts ride along only to exhibit the error bound.
    events = read_table(spark, sf_dir, "events")
    per_shard = SK.cms_sketch(
        events, "event_type", shard_col=F.col("user_id") % _CMS_SHARDS
    )
    sketch = SK.cms_merge(per_shard)
    keys = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    est = SK.cms_estimate(sketch, keys.select("event_type"), "event_type")
    return est.join(keys, "event_type").select(
        "event_type",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# KMV segment-overlap estimation (registered r5)

_KMV_K = SK.KMV_K
_KMV_UNION_EST = (
    f"CASE WHEN n_k < {_KMV_K} THEN CAST(n_k AS DOUBLE) "
    f"ELSE {float(_KMV_K - 1)} / u_k END"
)

_KMV_SQL = f"""
WITH hashes AS (
    SELECT DISTINCT event_type AS segment,
           md5(concat_ws('|', 'kmv', CAST(user_id AS VARCHAR))) AS h
    FROM events
),
kmv AS (
    SELECT segment, h FROM (
        SELECT segment, h,
               row_number() OVER (PARTITION BY segment ORDER BY h) AS rn
        FROM hashes
    ) WHERE rn <= {_KMV_K}
),
segs AS (SELECT DISTINCT segment FROM kmv),
pairs AS (
    SELECT a.segment AS seg_a, b.segment AS seg_b
    FROM segs a, segs b WHERE a.segment < b.segment
),
sides AS (
    SELECT p.seg_a, p.seg_b, k.h,
           max(CASE WHEN k.segment = p.seg_a THEN 1 ELSE 0 END) AS in_a,
           max(CASE WHEN k.segment = p.seg_b THEN 1 ELSE 0 END) AS in_b
    FROM pairs p JOIN kmv k ON k.segment = p.seg_a OR k.segment = p.seg_b
    GROUP BY 1, 2, 3
),
topk AS (
    SELECT *, row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY h) AS rn
    FROM sides
),
agg AS (
    SELECT seg_a, seg_b,
           CAST(count(*) AS BIGINT) AS n_k,
           CAST(sum(in_a * in_b) AS BIGINT) AS matched,
           max(CASE WHEN rn = {_KMV_K} THEN {SK.kmv_hash_u_sql('h')} END) AS u_k
    FROM topk WHERE rn <= {_KMV_K}
    GROUP BY 1, 2
)
SELECT seg_a, seg_b, n_k, matched,
       round({_KMV_UNION_EST}, 4) AS union_est,
       round(CAST(matched AS DOUBLE) / n_k, 6) AS jaccard_est,
       round((CAST(matched AS DOUBLE) / n_k) * ({_KMV_UNION_EST}), 4)
           AS intersection_est
FROM agg
"""


@register(
    "kmv_segment_overlap",
    sql=_KMV_SQL,
    description=f"KMV (k={_KMV_K} minimum values) segment-overlap "
    "estimation: per-segment sketches of the k smallest distinct user "
    "hashes, pairwise merged to estimate union size, Jaccard, and "
    "intersection from the sketches ALONE — the set-operation "
    "capability HLL lacks (unions only); small segments degrade to "
    "exact sets by construction ([EXT] sketch tier; Bar-Yossef 2002, "
    "Beyer SIGMOD 2007)",
)
def kmv_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the sketch build is one distinct + WindowGroupLimit-pruned
    # top-k per segment (k rows/segment out, whatever the segment
    # size); the pair stage touches sketches only — pairs x k rows,
    # quadratic in SEGMENTS (5 here), never in users. In production the
    # sketch table persists next to the data and overlap questions
    # never re-scan events.
    events = read_table(spark, sf_dir, "events")
    kmv = SK.kmv_per_group(events, key_col="user_id", group_col="event_type")
    return SK.kmv_pair_overlap(kmv, k=_KMV_K)


# ---------------------------------------------------------------------------
# stream-stream interval join (registered r6)

_SSJ_SQL = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
"""


@register(
    "streaming_interval_join",
    sql=_SSJ_SQL,
    description="stream-STREAM inner join (the attribution join run "
    "continuously): clicks joined to the same user's purchases within "
    "30 minutes, watermarks on BOTH sides + a two-sided time bound so "
    "the state store evicts buffered rows instead of holding history — "
    "the missing streaming-tier join beside windows/dedup/stateful; "
    "oracle = the batch interval join over the same rows, exact under "
    "one micro-batch ([EXT] streaming)",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: state is bounded by the 30-minute window + watermark slack
    # per side; the join keys on user_id so Spark co-partitions both
    # streams once. AvailableNow on the single fixture file = one
    # micro-batch, making the result provably equal to the batch twin.
    stream = W.read_events_stream(spark, sf_dir)
    joined = W.stream_stream_interval_join(
        stream, left_type="click", right_type="purchase",
        within="30 minutes", watermark="10 minutes",
    )
    # inner-join matches are emitted by the data batch itself; the
    # trailing no-data watermark batch only evicted state and re-ran
    # the stateful plan (~half the addBatch time, measured r12) —
    # skip it. The OUTER twin keeps it (null emission needs the
    # watermark to advance).
    return W.run_available_now(
        joined,
        output_mode="append",
        state_partitions=8,
        no_data_batch=False,
    )


# ---------------------------------------------------------------------------
# stream-static join (late r7): the one streaming join family that had
# no driver row — a stream enriched against a STATIC dimension.  The
# static side re-snapshots per micro-batch, needs no watermark on the
# static frame, and (broadcast-small here) compiles to a stateless
# broadcast hash join inside each micro-batch — the streaming analog of
# the reference's lookup-map joins (opportunity.py:128's org dict).

_STREAM_STATIC_SQL = """
SELECT n.n_name AS nation,
       e.event_type,
       count(*) AS n_events,
       round(sum(e.value), 2) AS value_sum
FROM events e
JOIN nation n ON n.n_nationkey = e.user_id % 25
GROUP BY 1, 2
"""


@register(
    "stream_static_enrich",
    sql=_STREAM_STATIC_SQL,
    description="stream-static enrichment join: the events stream "
    "derives a dimension key (user_id % 25) and inner-joins the STATIC "
    "broadcast nation dim inside each micro-batch (stateless — no "
    "watermark or join state needed on either side; the static frame "
    "re-snapshots per batch), then a windowless keyed rollup runs "
    "under Trigger.AvailableNow to the memory sink. Completes the "
    "streaming join family beside the stateful stream-stream interval "
    "join; streaming analog of the reference's lookup-map enrichment "
    "(opportunity.py:128) (EXT-5)",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = W.read_events_stream(spark, sf_dir)
    nation = read_table(spark, sf_dir, "nation")
    enriched = stream.join(
        F.broadcast(nation),
        nation.n_nationkey == stream.user_id % 25,
    )
    agg = (
        enriched.groupBy(F.col("n_name").alias("nation"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )
    # no_data_batch=False (r13): complete-mode re-emission is
    # identical with no new data — same rationale as tumbling counts
    return W.run_available_now(agg, state_partitions=8,
                               no_data_batch=False)


# ---------------------------------------------------------------------------
# stream-stream LEFT OUTER interval join (r8): the null-emission half
# of the streaming join surface — results that may only appear when the
# watermark PROVES no match can still arrive

_SSJ_OUTER_SQL = """
WITH c AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
p AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
-- the global watermark at drain time: min of both sides' max event
-- time (Spark tracks event-time stats at ms precision) minus the delay
wm AS (
    SELECT least(date_trunc('millisecond', (SELECT max(ts) FROM c)),
                 date_trunc('millisecond', (SELECT max(ts) FROM p)))
           - INTERVAL 10 MINUTE AS w
)
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM c LEFT JOIN p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
WHERE p.event_id IS NOT NULL                      -- matches emit eagerly
   OR c.ts + INTERVAL '30 minutes' < (SELECT w FROM wm)  -- proven unmatched
"""


@register(
    "streaming_outer_interval_join",
    sql=_SSJ_OUTER_SQL,
    description="stream-stream LEFT OUTER interval join: matches emit "
    "eagerly; null-padded rows emit ONLY once the global watermark "
    "(min of both sides' max event time - delay) proves no match can "
    "still arrive, and rows still inside that horizon at drain stay "
    "buffered — the oracle states the left join PLUS the watermark "
    "cutoff, so the stateful emission contract itself is hash-checked "
    "([EXT] streaming, beside the inner streaming_interval_join)",
)
def streaming_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: same bounded state as the inner join (two-sided time
    # bound + watermarks); the outer side only delays emission to the
    # watermark, it buffers nothing extra.
    stream = W.read_events_stream(spark, sf_dir)
    joined = W.stream_stream_interval_join_outer(
        stream, left_type="click", right_type="purchase",
        within="30 minutes", watermark="10 minutes",
    )
    return W.run_available_now(joined, output_mode="append", state_partitions=8)


# ---------------------------------------------------------------------------
# streaming near-dup candidates (r8): continuous ingestion probing a
# static MinHash-LSH index — the online half of the dedup funnel

_SNDC_SPLIT = 10  # doc_id % 10 == 0 streams in; the rest ARE the corpus

_SNDC_SQL = f"""
WITH w AS (SELECT doc_id, {{words}} AS w FROM documents),
sh AS (SELECT doc_id, {{shingles}} AS sh FROM w),
sig AS (SELECT doc_id, {{sig_cols}} FROM sh),
buckets AS ({{bucket_selects}}),
corpus AS (SELECT * FROM buckets WHERE doc_id % {_SNDC_SPLIT} <> 0),
batch  AS (SELECT * FROM buckets WHERE doc_id % {_SNDC_SPLIT} = 0)
SELECT DISTINCT b.doc_id AS new_doc, c.doc_id AS corpus_doc
FROM batch b
JOIN corpus c ON b.band = c.band AND b.bucket = c.bucket
"""


def _sndc_sql() -> str:
    # ext_queries is imported by the registry BEFORE this module, so
    # pulling its shingle/signature SQL fragments here is cycle-free —
    # ONE definition of the banding scheme shared with the batch twin
    from magshield_data_pipeline_spark.plans import ext_queries as X

    return _SNDC_SQL.format(
        words=X._WORDS,
        shingles=X._SHINGLES,
        sig_cols=X._SIG_COLS,
        bucket_selects=X._BUCKET_SELECTS,
    )


def sndc_pairs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-sunk streaming pairs frame — split out so the plan test
    can pin the micro-batch shape (no corpus shingle explode, a plain
    parquet scan of the materialized index) on the exact plan the
    registered query runs."""
    from magshield_data_pipeline_spark.operators import dedup as D
    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch,
        scratch_path,
    )

    idx_path = scratch_path(
        "sndc_lsh_idx",
        sf_dir,
        f"documents doc_id%{_SNDC_SPLIT}!=0 minhash{D.MINHASH_K} "
        f"bands{D.MINHASH_BANDS} v1",
    )

    def _build(tmp: str) -> None:
        corpus = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % _SNDC_SPLIT != 0
        )
        D.lsh_band_buckets(corpus).select(
            "band", "bucket", F.col("doc_id").alias("corpus_doc")
        ).write.parquet(tmp)

    ensure_scratch(idx_path, _build)
    corpus_idx = spark.read.parquet(idx_path)
    stream = W.read_table_stream(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _SNDC_SPLIT == 0
    )
    batch_idx = D.lsh_band_buckets_stateless(stream)
    return (
        batch_idx.join(corpus_idx, ["band", "bucket"])
        .select(
            F.col("doc_id").alias("new_doc"),
            "corpus_doc",
        )
        .dropDuplicates(["new_doc", "corpus_doc"])
    )


@register(
    "streaming_near_dup_candidates",
    sql=_sndc_sql(),
    description="continuous-ingestion near-dup detection: a stream of "
    "new documents derives MinHash-LSH band buckets STATELESSLY "
    "(array_min/transform projection — no aggregation, so the plan "
    "stays append-legal) and probes the corpus index MATERIALIZED "
    "once to parquet (write-once atomic publish) via a stream-static "
    "join — per-batch cost excludes the index build, plan-pinned; "
    "oracle = the batch band join over the same split — the online "
    "half of the dedup funnel ([EXT] streaming + dedup tiers)",
)
def streaming_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale (VERDICT r8 item 3 — the index is now MATERIALIZED, not
    # re-derived): the corpus bucket table is written to parquet ONCE
    # (write-once atomic publish via ensure_scratch) and the stream
    # probes the on-disk index — the micro-batch plan contains a plain
    # parquet scan of (band, bucket, corpus_doc) and NO corpus shingle
    # explode or signature aggregation (pinned by
    # tests/test_plan_shapes.py::test_streaming_near_dup_probes_
    # materialized_index). Per-batch cost is O(batch buckets +
    # collisions), never O(corpus²) and never the corpus index build —
    # the incremental_candidate_pairs contract, run continuously.
    # dropDuplicates holds one state row per emitted pair; production
    # bounds it with dropDuplicatesWithinWatermark on an ingest-time
    # column.
    pairs = sndc_pairs_stream(spark, sf_dir)
    # no_data_batch=False (r13): dropDuplicates emits each pair on
    # FIRST sight within the data batch (no watermark in this plan) —
    # the advance batch re-ran the stateful plan and emitted nothing
    return W.run_available_now(pairs, output_mode="append",
                               state_partitions=8, no_data_batch=False)



# ---------------------------------------------------------------------------
# streaming curation gate (r9): the ingest-time half of the curation
# funnel — unicode NFC canonicalization (Arrow mapInPandas) + the
# Gopher rule gate running INSIDE a stream, proving the quality tier's
# projection chain is append-legal and composes with the batch
# pipeline (curation_pipeline_v2 is the backfill twin of this shape)

_SCG_NORM = r"trim(regexp_replace(lower(t), '\s+', ' ', 'g'))"
_SCG_WORDS = f"str_split({_SCG_NORM}, ' ')"

_SCG_SQL = rf"""
WITH deco AS (
    SELECT doc_id, source,
           text || chr(10) ||
           (CASE WHEN doc_id % 5 = 0 THEN '- bullet one' ELSE 'body one' END)
           || ' caf' || chr(233) AS raw
    FROM documents WHERE doc_id % 3 = 0
),
canon AS (SELECT doc_id, source, nfc_normalize(raw) AS t FROM deco),
m AS (
    SELECT doc_id, source,
        len({_SCG_WORDS}) AS nw,
        length(replace({_SCG_NORM}, ' ', '')) AS total_chars,
        length({_SCG_NORM})
            - length(replace({_SCG_NORM}, '#', '')) AS hash_count,
        len(str_split(t, chr(10))) AS n_lines,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '- %' OR x LIKE '* %')) AS bullets,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '%...')) AS ell_lines,
        len(list_filter({_SCG_WORDS},
            x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
        (CASE WHEN list_contains({_SCG_WORDS}, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_SCG_WORDS}, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_SCG_WORDS}, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_SCG_WORDS}, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_SCG_WORDS}, 'and') THEN 1 ELSE 0 END
        ) AS stop_hits
    FROM canon
),
flags AS (
    SELECT doc_id, source,
           (nw BETWEEN 40 AND 100000)
           AND ((total_chars / nw) BETWEEN 3.0 AND 10.0)
           AND (hash_count / nw) < 0.05
           AND (bullets / n_lines) < 0.3
           AND (ell_lines / n_lines) < 0.2
           AND (alpha_words / nw) >= 0.9
           AND stop_hits >= 2 AS keep
    FROM m
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept
FROM flags GROUP BY source
"""


@register(
    "streaming_quality_gate",
    sql=_SCG_SQL,
    description="the curation quality gate running INSIDE a stream: "
    "every 3rd document streams through unicode NFC canonicalization "
    "(Arrow mapInPandas — stream-legal, pipelines inside the micro-"
    "batch scan stage) and the Gopher rule set (pure projection), "
    "rolled up per source under Trigger.AvailableNow; a bullet line "
    "planted on the doc_id%5 residue plus the accented suffix give "
    "both stages teeth — the ingest-time half of the curation funnel "
    "(curation_pipeline_v2 is its backfill twin) ([EXT] streaming + "
    "curation tiers)",
)
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: NFC + the rule projection are stateless (no watermark, no
    # join state); the only stateful stage is the complete-mode
    # per-source rollup — bounded by |sources|. Per-batch cost is the
    # batch cost of the batch's rows, nothing corpus-shaped.
    from magshield_data_pipeline_spark.operators import text as T

    stream = W.read_table_stream(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    deco = stream.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit("\n"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("- bullet one"))
            .otherwise(F.lit("body one")),
            # DECOMPOSED e + U+0301 where the oracle appends the
            # PRECOMPOSED chr(233): the two engines see different
            # BYTES and the hashes meet only because the streaming
            # NFC stage actually normalizes — the canonicalization is
            # load-bearing for the check, not decorative
            F.lit(" cafe\u0301"),
        ).alias("raw"),
    )
    canon = T.unicode_canonicalize(
        deco, text_col="raw", nfc_col="t", stripped_col=None
    )
    gq = T.gopher_quality_flags(
        canon, text_col="t", id_col="doc_id", keep_cols=("source",)
    )
    rollup = gq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("keep"), F.lit(1))).alias("n_kept"),
    )
    # no_data_batch=False (r13): complete-mode re-emission is
    # identical with no new data — same rationale as tumbling counts
    return W.run_available_now(
        rollup, output_mode="complete", state_partitions=8,
        no_data_batch=False,
    )

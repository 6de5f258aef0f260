"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` ([EXT] streaming tier, SURVEY §2.10).

``session_window`` (windows.py) covers the declarative case; this module
is the escape hatch the driver mandates for semantics Spark's built-in
windows cannot express — here, a sessionizer that (a) emits a session
row the moment a later event from the same user proves the session
closed (gap exceeded), without waiting for the watermark, and (b) holds
the still-open tail session in explicit keyed state with an event-time
timeout so it flushes when the watermark finally passes end + gap.

Scale posture: state is one fixed-width tuple per active user (start,
last, n, sum — ~32 bytes), not the session's events; the grouping
shuffle partitions by user_id, and Arrow batches the per-group rows
into pandas. Watermark + timeout bound state lifetime, so a 100 TB/day
stream holds state only for users active inside the watermark horizon.

The UDF body is deliberately self-contained (imports inside, no module
globals) so cloudpickle ships it whole to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

# open-session accumulator: epoch-µs bounds + running count/sum
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("vsum", DoubleType()),
    ]
)


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Sessionize ``events`` per user_id with an inactivity gap.

    Emits one row per CLOSED session: closure is proven either by a
    later same-user event beyond the gap (emitted in that micro-batch)
    or by the watermark passing last_event + gap (event-time timeout).
    Session bounds follow ``F.session_window`` semantics:
    end = last event + gap. A very large ``watermark`` delay suppresses
    the timeout path entirely (useful for deterministic backfills where
    only same-user-proven closures should emit).
    """
    gap_us = gap_minutes * 60_000_000

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        gap = gap_us  # bind locally; the closure cell is the only capture
        user_id = key[0]

        def emit_frame(starts, lasts, ns, vsums):
            return pd.DataFrame(
                {
                    "user_id": np.full(len(starts), user_id, dtype="int64"),
                    "session_start": pd.to_datetime(starts, unit="us"),
                    "session_end": pd.to_datetime(lasts + gap, unit="us"),
                    "n_events": np.asarray(ns, dtype="int64"),
                    "value_sum": np.round(np.asarray(vsums, dtype="float64"), 2),
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield emit_frame(
                np.array([start_us]), np.array([last_us]), [n], [vsum]
            )
            return

        # per-GROUP hot path (r13, guide §4.2): this body runs once per
        # user per micro-batch (~3k calls/batch), so per-call pandas
        # overhead multiplies.  Measured per 3k calls: skipping the
        # 1-element concat + converting via to_numpy().view() instead
        # of a double Series astype = 3.1 s -> 0.05 s; sorting the two
        # extracted arrays by the same numpy quicksort sort_values
        # delegates to (identical permutation) skips a per-call
        # DataFrame sort.
        parts = list(pdf_iter)
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
        # normalize to ns first: pandas may hand back datetime64[us]
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[ns]").view("int64") // 1000
        vals = pdf["value"].to_numpy(dtype="float64")
        order = np.argsort(ts_us, kind="quicksort")
        ts_us = ts_us[order]
        vals = vals[order]

        # sessions = maximal runs with inter-event gaps <= gap, computed
        # VECTORIZED: boundary positions from one diff, per-session count
        # and value sum from index arithmetic + add.reduceat — no
        # per-event Python loop (the previous fold was the hot spot at
        # 500k events/batch). Summation-order noise is absorbed by the
        # round(. , 2) output contract, same as the SQL oracle's SUM.
        b = np.flatnonzero(np.diff(ts_us) > gap)
        s_idx = np.concatenate(([0], b + 1))
        e_idx = np.concatenate((b, [ts_us.size - 1]))
        g_start = ts_us[s_idx].copy()
        g_last = ts_us[e_idx]
        g_n = (e_idx - s_idx + 1).astype("int64")
        g_vsum = np.add.reduceat(vals, s_idx)

        carried = state.get if state.exists else None
        closed_carry = None
        if carried is not None:
            c_start, c_last, c_n, c_vsum = carried
            if ts_us[0] - c_last <= gap:
                # carried open session continues into the first group
                g_start[0] = c_start
                g_n[0] += c_n
                g_vsum[0] += c_vsum
            else:
                closed_carry = carried

        # every group except the last is proven closed by a later event;
        # the tail group becomes the carried state
        out_start = g_start[:-1]
        out_last = g_last[:-1]
        out_n = g_n[:-1]
        out_vsum = g_vsum[:-1]
        if closed_carry is not None:
            out_start = np.concatenate(([closed_carry[0]], out_start))
            out_last = np.concatenate(([closed_carry[1]], out_last))
            out_n = np.concatenate(([closed_carry[2]], out_n))
            out_vsum = np.concatenate(([closed_carry[3]], out_vsum))
        if out_start.size:
            yield emit_frame(out_start, out_last, out_n, out_vsum)

        state.update(
            (int(g_start[-1]), int(g_last[-1]), int(g_n[-1]), float(g_vsum[-1]))
        )
        # flush the open tail when the watermark passes end + gap
        # (plain int: the state server JSON-serializes this value)
        state.setTimeoutTimestamp(int(g_last[-1] + gap) // 1000)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming funnel tracker

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t0", TimestampType()),
        StructField("t1", TimestampType()),
        StructField("t2", TimestampType()),
        StructField("n_stages", LongType()),
    ]
)

# per-user stage times in epoch-µs; -1 = stage not yet reached.
# t*_us are the derived ordered-prefix times; m1/m2_us buffer each later
# stage's UNCONDITIONAL minimum event time, so a stage event that
# arrives in an earlier micro-batch than the prior stage's event is
# remembered and re-examined once the prior stage unlocks.
_FUNNEL_BUFFER_K = 3

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t0_us", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("m1_us", ArrayType(LongType())),
        StructField("m2_us", ArrayType(LongType())),
    ]
)


def funnel_stateful(
    events: DataFrame,
    stages: tuple[str, str, str] = ("signup", "click", "purchase"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming ordered-funnel tracker: per-user conversion state as a
    change feed. State is three longs plus two ≤k-element arrays per
    user (~80 bytes at k=3, any event volume): the derived stage times
    plus the K SMALLEST distinct unconditional times seen so far for
    each later stage. Each micro-batch folds the batch's per-stage
    minima into state VECTORIZED (intra-batch event order never
    matters) and re-derives the ordered prefix (stage i counts only
    at/after the user's stage-(i-1) time), emitting the user's updated
    progress row once the funnel is entered.

    Cross-batch delivery: buffering the k smallest times per stage
    means a later-stage event that arrives BEFORE the prior stage's
    event (in an earlier micro-batch) still counts once the prior
    stage unlocks — including the reordering case a single buffered
    minimum cannot cover (an ineligible earlier event shadowing a
    discarded eligible one: with k ≥ 2 the eligible time survives in
    the buffer, so the tracker now matches the batch oracle there).
    Exact-parity contract: exact under single-micro-batch delivery
    (Trigger.AvailableNow on one source file — what the oracle
    checks), and under any reordering in which fewer than k distinct
    stage-i times smaller than the eventual winner arrive before the
    stage-(i-1) time finalizes. Beyond that (≥ k distinct shadowing
    times), progress may still be UNDER-reported — a later, still
    valid, never-invented stage time — since exactness in general
    requires the full per-stage event-time set (unbounded state);
    bounded state is the point of the operator. The boundary is pinned
    mechanically at k-1/k/k+1 shadowing times by tests/
    test_streaming.py::test_streaming_funnel_k_buffer_boundary_sweep
    (exact at k-1; first under-report at exactly k).

    STATE-SCHEMA MIGRATION (v2): the per-stage buffers changed from one
    long to an array of longs. Structured Streaming pins the state
    schema at first checkpoint creation and rejects the long→array
    change (StateSchemaNotCompatible) — a stream upgraded across this
    change must restart from a FRESH checkpoint directory (replaying
    the source or accepting a bounded gap); there is no in-place
    migration path for applyInPandasWithState state.

    The UDF body is self-contained (imports inside, sentinel ints, no
    module globals) — cloudpickle ships it whole to executors."""
    s0, s1, s2 = stages
    buffer_k = _FUNNEL_BUFFER_K

    def fn(key, pdf_iter, state):
        import pandas as pd

        user_id = key[0]
        if state.hasTimedOut:
            # buffer-only state (user never entered the funnel) whose
            # event times the watermark has passed: any signup that
            # could still unlock these buffers would need t0 <= the
            # buffered times, i.e. would itself arrive later than the
            # watermark allows — safe to evict, state stays bounded to
            # funnel-entered users + the watermark horizon
            state.remove()
            return

        # per-GROUP hot path (r13, guide §4.2) — same rationale as the
        # sessionizer above: one call per user per micro-batch, so the
        # 1-element concat + double Series astype dominated addBatch
        # (measured 3.1 s -> 0.05 s per 3k calls with view())
        parts = list(pdf_iter)
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[ns]").view("int64") // 1000
        etype = pdf["event_type"].to_numpy()

        if state.exists:
            t0, t1, t2, m1, m2 = state.get
            m1 = sorted(m1) if m1 is not None else []
            m2 = sorted(m2) if m2 is not None else []
        else:
            t0, t1, t2, m1, m2 = -1, -1, -1, [], []

        def stage_min(name, not_before):
            import numpy as np

            mask = (etype == name) & (ts_us >= not_before)
            return int(ts_us[mask].min()) if np.any(mask) else -1

        def min_pos(a, b):
            """min over the non-sentinel values; -1 when both unset."""
            if a < 0:
                return b
            if b < 0:
                return a
            return min(a, b)

        def fold_k_smallest(buf, name):
            """merge the batch's k smallest distinct times for *name*
            into *buf*, keeping the k smallest distinct overall."""
            import numpy as np

            batch = np.unique(ts_us[etype == name])[:buffer_k]
            merged = sorted(set(buf) | {int(x) for x in batch})
            return merged[:buffer_k]

        def eligible_min(buf, bound):
            """smallest buffered time at/after *bound*; -1 if none."""
            for x in buf:  # buf is sorted ascending, <= k elements
                if x >= bound:
                    return x
            return -1

        c0 = stage_min(s0, 0)
        if c0 >= 0 and (t0 < 0 or c0 < t0):
            t0 = c0
        # buffer each later stage's k smallest unconditional times —
        # candidates for when (or in case) the prior stage's time
        # tightens; k > 1 covers an ineligible earlier event shadowing
        # a discarded eligible one
        m1 = fold_k_smallest(m1, s1)
        m2 = fold_k_smallest(m2, s2)
        # re-derive the ordered prefix: carried time, this batch's
        # eligible minimum, and the smallest buffered time that has
        # become eligible
        if t0 >= 0:
            c1 = stage_min(s1, t0)
            t1 = min_pos(t1, min_pos(c1, eligible_min(m1, t0)))
        if t1 >= 0:
            c2 = stage_min(s2, t1)
            t2 = min_pos(t2, min_pos(c2, eligible_min(m2, t1)))

        state.update((int(t0), int(t1), int(t2), m1, m2))
        if t0 < 0:
            # stage buffers held, funnel not entered: schedule eviction
            # once the watermark passes the buffered event times (must
            # be strictly ahead of the current watermark)
            horizon_us = max(m1 + m2, default=-1)
            horizon_ms = horizon_us // 1000 + 1
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 60_000))
            return

        def ts_or_none(us):
            return pd.Timestamp(us, unit="us") if us >= 0 else None

        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "t0": [ts_or_none(t0)],
                "t1": [ts_or_none(t1)],
                "t2": [ts_or_none(t2)],
                "n_stages": [3 if t2 >= 0 else (2 if t1 >= 0 else 1)],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            FUNNEL_SCHEMA,
            _FUNNEL_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

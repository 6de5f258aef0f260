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
        import pandas as pd

        gap = gap_us  # bind locally; the closure cell is the only capture
        user_id = key[0]

        def emit(start_us, last_us, n, vsum):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us + gap, unit="us")],
                    "n_events": [n],
                    "value_sum": [round(vsum, 2)],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield emit(start_us, last_us, n, vsum)
            return

        parts = [pdf[["ts", "value"]] for pdf in pdf_iter]
        pdf = pd.concat(parts).sort_values("ts")
        # normalize to ns first: pandas may hand back datetime64[us]
        ts_us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
        vals = pdf["value"].to_numpy()

        carried = state.get if state.exists else None
        # fold carried open session with this batch's rows
        if carried is not None and ts_us[0] - carried[1] <= gap:
            start_us, last_us, n, vsum = carried
        else:
            if carried is not None:
                yield emit(*carried)
            start_us, last_us, n, vsum = ts_us[0], ts_us[0], 0, 0.0
            # first row folds in below

        for t, v in zip(ts_us, vals):
            if t - last_us > gap:
                yield emit(start_us, last_us, n, vsum)
                start_us, n, vsum = t, 0, 0.0
            last_us = t
            n += 1
            vsum += float(v)

        state.update((int(start_us), int(last_us), int(n), float(vsum)))
        # flush the open tail when the watermark passes end + gap
        # (plain int: the state server JSON-serializes this value)
        state.setTimeoutTimestamp(int(last_us + gap) // 1000)

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

# per-user stage times in epoch-µs; -1 = stage not yet reached
_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t0_us", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
    ]
)


def funnel_stateful(
    events: DataFrame,
    stages: tuple[str, str, str] = ("signup", "click", "purchase"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming ordered-funnel tracker: per-user conversion state as a
    change feed. State is the user's stage-completion times (one
    fixed-width 3-long tuple per user — ~24 bytes, any event volume);
    each micro-batch applies the strict in-order rule (stage i counts
    only at/after the user's stage-(i-1) time) VECTORIZED over the
    batch — min-per-stage against carried state, so intra-batch event
    order never matters — and emits the user's updated progress row.

    Under Trigger.AvailableNow on a static source this yields exactly
    the batch funnel's per-user stage times (the parity the oracle
    checks); on a live stream it is the incremental funnel dashboard
    feed. Stage times only move forward-tighter (monotone), so emitted
    progress is append-safe.

    The UDF body is self-contained (imports inside, sentinel ints, no
    module globals) — cloudpickle ships it whole to executors."""
    s0, s1, s2 = stages

    def fn(key, pdf_iter, state):
        import pandas as pd

        user_id = key[0]
        if state.hasTimedOut:  # NoTimeout configured; defensive
            state.remove()
            return

        parts = [pdf[["ts", "event_type"]] for pdf in pdf_iter]
        pdf = pd.concat(parts)
        ts_us = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()
        etype = pdf["event_type"].to_numpy()

        t0, t1, t2 = state.get if state.exists else (-1, -1, -1)

        def stage_min(name, not_before):
            import numpy as np

            mask = (etype == name) & (ts_us >= not_before)
            return int(ts_us[mask].min()) if np.any(mask) else -1

        c0 = stage_min(s0, 0)
        if c0 >= 0 and (t0 < 0 or c0 < t0):
            t0 = c0
        if t0 >= 0:
            c1 = stage_min(s1, t0)
            if c1 >= 0 and (t1 < 0 or c1 < t1):
                t1 = c1
        if t1 >= 0:
            c2 = stage_min(s2, t1)
            if c2 >= 0 and (t2 < 0 or c2 < t2):
                t2 = c2

        if t0 < 0:
            return  # user never entered the funnel; hold no state

        state.update((int(t0), int(t1), int(t2)))

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
            GroupStateTimeout.NoTimeout,
        )
    )

"""Stateful streaming sessionization — the streaming twin of
``plans/dataset_queries.q_sessionize`` (a 30-minute inactivity gap
closes a session).

``applyInPandasWithState`` carries one bounded state row per user
(open session: number, counters, id extrema, last event time in µs —
the same µs precision the batch shadow uses, since unix-seconds
truncation misclassifies near-threshold gaps).  A summary row is
emitted for each session the moment a later event CLOSES it (gap >
SESSION_GAP); the still-open session stays in state.

Contract, pinned in tests/test_stateful_sessions.py against the batch
shadow: across ANY micro-batch slicing, the emitted closed sessions
equal ``q_sessionize``'s result minus each user's LAST (still-open)
session.  This default mode assumes in-order arrival per user (a file
source replaying event-time order); for a real out-of-order stream use
``stateful_sessionize_wm`` — the watermark mode that reorder-buffers
within the watermark and engine-drops (with an exact census) beyond it
(tests/test_streaming_watermark.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

SESSION_GAP_US = 1800 * 1_000_000  # mirrors q_sessionize's threshold

OUTPUT_SCHEMA = ("user_id long, session_no long, n_events long, "
                 "first_event long, last_event long")
STATE_SCHEMA = ("session_no long, n_events long, first_event long, "
                "last_event long, last_ts_us long")

_COLS = ["user_id", "session_no", "n_events", "first_event", "last_event"]


def _sessions_user(key, pdfs, state):
    """Per-user stateful fold: close sessions on gap > SESSION_GAP_US.

    ``first_event``/``last_event`` are the MIN/MAX event ids of the
    session (the batch shadow aggregates min/max, which only equals
    first/last-in-time when ids are time-monotone — track extrema, not
    endpoints, so the contract holds either way)."""
    (user,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    if state.exists:
        sno, n, lo, hi, last_us = state.get
    else:
        sno, n, lo, hi, last_us = 0, 0, 0, 0, None
    closed = []
    for ts, eid in zip(rows["ts"], rows["event_id"]):
        us = int(pd.Timestamp(ts).value) // 1000
        eid = int(eid)
        if last_us is None or us - last_us > SESSION_GAP_US:
            if n:
                closed.append((user, sno, n, lo, hi))
            sno += 1
            n, lo, hi = 0, eid, eid
        n += 1
        lo, hi = min(lo, eid), max(hi, eid)
        last_us = us
    state.update((int(sno), int(n), int(lo), int(hi), int(last_us)))
    yield pd.DataFrame(closed, columns=_COLS)


WM_STATE_SCHEMA = STATE_SCHEMA + ", buf string"


def _sessions_user_wm(key, pdfs, state):
    """Watermark-mode per-user fold: reorder-buffer arrivals in state,
    fold ONLY events strictly below the current watermark in
    (ts, event_id) order (streaming/watermark.py contract), flush via
    event-time timeouts.  Stragglers beyond the watermark are engine-
    dropped and counted in the progress census."""
    from .watermark import (
        dump_buffer, load_buffer, schedule_flush, split_ready,
    )

    (user,) = key
    if state.exists:
        sno, n, lo, hi, last_us, buf_json = state.get
        buf = load_buffer(buf_json)
        if last_us is not None and last_us < 0:
            last_us = None                  # sentinel: nothing folded yet
    else:
        sno, n, lo, hi, last_us, buf = 0, 0, 0, 0, None, []
    if not state.hasTimedOut:
        rows = pd.concat(list(pdfs), ignore_index=True)
        for ts, eid in zip(rows["ts"], rows["event_id"]):
            buf.append([int(pd.Timestamp(ts).value) // 1000, int(eid)])
    wm_ms = state.getCurrentWatermarkMs()
    ready, pending = split_ready(buf, wm_ms)
    closed = []
    for us, eid in ready:
        if last_us is None or us - last_us > SESSION_GAP_US:
            if n:
                closed.append((user, sno, n, lo, hi))
            sno += 1
            n, lo, hi = 0, eid, eid
        n += 1
        lo, hi = min(lo, eid), max(hi, eid)
        last_us = us
    state.update((int(sno), int(n), int(lo), int(hi),
                  int(last_us) if last_us is not None else -1,
                  dump_buffer(pending)))
    schedule_flush(state, pending, wm_ms)
    if closed:
        yield pd.DataFrame(closed, columns=_COLS)


def stateful_sessionize_wm(events: "DataFrame",
                           watermark: str = "10 minutes") -> "DataFrame":
    """Out-of-order-tolerant twin of ``stateful_sessionize``: same
    closed-session output, but arrivals may be shuffled arbitrarily
    within the ``watermark`` delay (reorder buffer + event-time
    timeouts); older stragglers are engine-dropped and observable via
    ``watermark.watermark_drop_census``.  Pinned in
    tests/test_stateful_sessions.py: shuffled delivery == in-order
    delivery == batch shadow, and the straggler census is exact."""
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming.state import GroupStateTimeout

    spark = SparkSession.getActiveSession()
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)  # --py-files equivalent

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_user_wm,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=WM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stateful_sessionize(events: "DataFrame") -> "DataFrame":
    """events(event_id, ts, user_id, ...) -> closed-session summaries
    ``(user_id, session_no, n_events, first_event, last_event)``.

    Works on a streaming DataFrame; unit tests drive it through a
    parquet file source with varied micro-batch slicings."""
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming.state import GroupStateTimeout

    spark = SparkSession.getActiveSession()
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)  # --py-files equivalent

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Custom stateful streaming operator: cross-batch consecutive dedup.

The batch pipeline dedups consecutive blocks WITHIN a document; a live
crawl also sees the same boilerplate-heavy page re-fetched across
micro-batches.  This operator extends the HardsubX consecutive-dedup
semantics across time per host: within each host's stream (event-time
order), a document whose extracted text is near-identical
(Levenshtein ratio >= DEDUP_SIM_THRESHOLD) to the host's previously kept
document is suppressed.

Implemented with ``applyInPandasWithState`` (the Structured Streaming
escape hatch for custom stateful logic): state = the last kept document's
normalized prefix + timestamp per host, carried across micro-batches.
State is bounded (one row per host).  The DEFAULT is watermark mode
(out-of-order tolerant: reorder buffer + event-time-timeout flush +
engine-side late-drop census + event-time idle-state GC — see
streaming/watermark.py); ``watermark=None`` opts into the in-order
fast path for sources that replay event-time order.  NB: in the
in-order path with a processing-time timeout pending, an availableNow
query stays alive until the timeout fires — so that path defaults to
NoTimeout, and its GC is opt-in via ``idle_timeout_ms``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

from ..config import DEDUP_PREFIX_CHARS, DEDUP_SIM_THRESHOLD
from ..functions.levenshtein import at_least_as_similar

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

OUTPUT_SCHEMA = ("host string, url string, warc_ts timestamp, "
                 "extracted_text string, kept boolean")
STATE_SCHEMA = "prefix string"

# scheme-agnostic, no trailing-slash requirement: http:// URLs and
# pathless https URLs extract a real host instead of '' (round-2
# advisory — '' lumped unrelated URLs into one shared dedup state)
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"


WM_STATE_SCHEMA = "prefix string, last_us long, buf string"


def _make_dedup_host(idle_timeout_ms: int | None):
    def _dedup_host(key, pdfs, state):
        return _dedup_host_impl(key, pdfs, state, idle_timeout_ms)
    return _dedup_host


def _make_dedup_host_wm(idle_horizon_ms: int):
    def _dedup_host_wm_fn(key, pdfs, state):
        return _dedup_host_wm(key, pdfs, state, idle_horizon_ms)
    return _dedup_host_wm_fn


def _dedup_host_wm(key, pdfs, state, idle_horizon_ms):
    """Watermark-mode per-host function: fold ONLY events strictly below
    the current watermark, in (warc_ts, url) order, buffering the rest
    in state (see streaming/watermark.py for the disorder contract).
    Beyond-watermark stragglers never reach this function — the engine
    drops and counts them (watermark_drop_census).  A host idle past
    ``idle_horizon_ms`` (event time) has its state row removed — after
    GC a refetch starts a fresh chain, the same tradeoff as the
    in-order mode's processing-time idle_timeout_ms."""
    from .watermark import (
        dump_buffer, load_buffer, schedule_flush, split_ready,
    )

    (host,) = key
    new = (None if state.hasTimedOut
           else pd.concat(list(pdfs), ignore_index=True))
    if host == "":
        # unparseable-host rows pass through independently, no state
        # (mirrors the in-order operator); nothing to reorder — kept
        # depends on no neighbor
        if new is not None and len(new):
            kept = [bool((t or "")[:DEDUP_PREFIX_CHARS])
                    for t in new["extracted_text"]]
            out = new.assign(host=host, kept=kept)
            yield out[["host", "url", "warc_ts", "extracted_text", "kept"]]
        return
    if state.exists:
        prefix, last_us, buf_json = state.get
        prev = prefix if prefix != "" else None
        last_us = None if last_us is None or last_us < 0 else int(last_us)
        buf = load_buffer(buf_json)
    else:
        prev, last_us, buf = None, None, []
    if new is not None:
        for ts, url, text in zip(new["warc_ts"], new["url"],
                                 new["extracted_text"]):
            buf.append([int(pd.Timestamp(ts).value) // 1000, url, text])
    wm_ms = state.getCurrentWatermarkMs()
    ready, pending = split_ready(buf, wm_ms)
    if state.hasTimedOut and not ready and not pending:
        # idle-horizon GC: the watermark passed last activity + horizon
        # with nothing buffered — drop the state row
        state.remove()
        return
    out_rows = []
    for ts_us, url, text in ready:
        cur = (text or "")[:DEDUP_PREFIX_CHARS]
        if prev is not None and at_least_as_similar(
                cur, prev, DEDUP_SIM_THRESHOLD):
            kept = False
        else:
            kept = bool(cur)
            if cur:
                prev = cur
        out_rows.append((host, url, pd.Timestamp(ts_us * 1000), text, kept))
        last_us = ts_us
    state.update((prev if prev is not None else "",
                  last_us if last_us is not None else -1,
                  dump_buffer(pending)))
    schedule_flush(state, pending, wm_ms, last_us, idle_horizon_ms)
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["host", "url", "warc_ts", "extracted_text", "kept"])


def _dedup_host_impl(key, pdfs, state, idle_timeout_ms):
    """Per-host stateful function: suppress docs near-identical to the
    previously kept one (in warc_ts order, across micro-batches)."""
    (host,) = key
    prev = state.get[0] if state.exists else None
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["warc_ts", "url"], kind="mergesort")
    if host == "":
        # unparseable-host rows pass through independently: no shared
        # chain, no state — unrelated URLs must never suppress each other
        kept = [bool((t or "")[:DEDUP_PREFIX_CHARS])
                for t in rows["extracted_text"]]
        out = rows.assign(host=host, kept=kept)
        yield out[["host", "url", "warc_ts", "extracted_text", "kept"]]
        return
    kept_flags = []
    for text in rows["extracted_text"]:
        cur = (text or "")[:DEDUP_PREFIX_CHARS]
        if prev is not None and at_least_as_similar(
                cur, prev, DEDUP_SIM_THRESHOLD):
            kept_flags.append(False)
        else:
            kept_flags.append(bool(cur))
            if cur:
                prev = cur
    state.update((prev if prev is not None else "",))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    out = rows.assign(host=host, kept=kept_flags)
    yield out[["host", "url", "warc_ts", "extracted_text", "kept"]]


def batch_host_dedup(extracted: "DataFrame") -> "DataFrame":
    """Batch-equivalence shadow of ``stateful_host_dedup``: the same
    prev-KEPT consecutive-dedup chain per host, computed over a bounded
    batch with JVM higher-order functions (collect per host -> sort by
    (warc_ts, url) -> left fold carrying the previously kept prefix) —
    no Python in the loop, one shuffle on host.

    Returns (host, url, kept).  Running the streaming operator
    availableNow over the same rows (any batch slicing) must produce the
    identical kept set — asserted in tests/test_stream_batch_shadow.py.

    Scale note: this collects one host's refetch window into a single
    row, so it is the ORACLE for bounded windows (a day of one host's
    fetches), not the scale path — the streaming operator with its
    one-row-per-host state is the scale path.
    """
    from pyspark.sql import functions as F

    # banded DP: sim >= T requires distance <= (1-T)*maxlen <=
    # (1-T)*DEDUP_PREFIX_CHARS, so levenshtein's threshold form (returns
    # -1 when the distance exceeds the band) is an EXACT-equivalent gate
    # at ~1/7th the DP cost — O(len * band) instead of O(len^2)
    band = int((1.0 - DEDUP_SIM_THRESHOLD) * DEDUP_PREFIX_CHARS) + 1
    lev = f"levenshtein(x.cur, acc.prev, {band})"
    sim = (
        f"(acc.prev <> '' AND x.cur <> '' AND {lev} >= 0 AND "
        f"(1.0 - cast({lev} as double)"
        f" / greatest(length(x.cur), length(acc.prev))) >= "
        f"{DEDUP_SIM_THRESHOLD})"
    )
    fold = f"""
    aggregate(
      items,
      cast(named_struct('prev', '', 'out',
           array()) as struct<prev:string,
                              out:array<struct<url:string,k:boolean>>>),
      (acc, x) -> named_struct(
        'prev', CASE WHEN {sim} THEN acc.prev
                     WHEN x.cur <> '' THEN x.cur
                     ELSE acc.prev END,
        'out', concat(acc.out, array(named_struct(
                 'url', x.url, 'k', (NOT {sim}) AND x.cur <> '')))
      )
    ).out
    """
    with_host = extracted.withColumn(
        "host", F.regexp_extract("url", HOST_RE, 1))
    base = with_host.select(
        "host", "warc_ts", "url",
        F.expr(f"substring(coalesce(extracted_text, ''), 1, "
               f"{DEDUP_PREFIX_CHARS})").alias("cur"))
    # unparseable-host rows pass through independently (mirrors the
    # stateful operator): each is kept iff non-empty, no shared chain
    orphans = base.where(F.col("host") == "").select(
        "host", "url", (F.col("cur") != "").alias("kept"))
    g = base.where(F.col("host") != "").groupBy("host").agg(
        F.expr("sort_array(collect_list(struct(warc_ts, url, cur)))")
         .alias("items"))
    return (
        g.select("host", F.explode(F.expr(fold)).alias("o"))
        .select("host", F.col("o.url").alias("url"),
                F.col("o.k").alias("kept"))
        .unionByName(orphans)
    )


def stateful_host_dedup(extracted: "DataFrame",
                        idle_timeout_ms: int | None = None,
                        watermark: str | None = "10 minutes",
                        idle_horizon_ms: int | None = None) -> "DataFrame":
    """extracted(url, warc_ts, extracted_text, ...) -> per-host stream with
    a ``kept`` flag assigned by cross-batch consecutive dedup.

    The DEFAULT is watermark mode (``watermark="10 minutes"``): real
    sources (Kafka, a live crawl) deliver out of order, so events are
    reorder-buffered per host and folded in event-time order once the
    watermark passes them; stragglers older than the watermark are
    dropped BY THE ENGINE and counted (watermark.watermark_drop_census).
    ``idle_horizon_ms`` is this mode's EVENT-TIME idle GC (default
    ``watermark.WM_IDLE_HORIZON_MS``, 24h): a host idle past it has its
    state row removed — a later refetch starts a FRESH chain, the
    documented GC tradeoff.

    Pass ``watermark=None`` to opt into the in-order fast path (a file
    source replaying event-time order — no reorder buffer, no drops);
    there ``idle_timeout_ms`` is the PROCESSING-TIME GC knob it always
    was.  The two GC knobs are deliberately separate parameters and
    each is rejected in the other's mode — a processing-time budget
    must never be silently reinterpreted as an event-time horizon
    (review finding).

    Works on a streaming DataFrame (applyInPandasWithState); the unit tests
    drive it through a memory-source availableNow query.
    """
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .watermark import WM_IDLE_HORIZON_MS

    spark = SparkSession.getActiveSession()
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)  # --py-files equivalent

    with_host = extracted.withColumn(
        "host", F.regexp_extract("url", HOST_RE, 1))
    if watermark is not None:
        if idle_timeout_ms is not None:
            raise ValueError(
                "idle_timeout_ms is the in-order mode's processing-time "
                "GC knob; watermark mode GCs on EVENT time — pass "
                "idle_horizon_ms (or watermark=None for in-order mode)")
        return (
            with_host.withWatermark("warc_ts", watermark)
            .select("host", "url", "warc_ts", "extracted_text")
            .groupBy("host")
            .applyInPandasWithState(
                _make_dedup_host_wm(
                    idle_horizon_ms if idle_horizon_ms is not None
                    else WM_IDLE_HORIZON_MS),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=WM_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    if idle_horizon_ms is not None:
        raise ValueError(
            "idle_horizon_ms is the watermark mode's event-time GC "
            "horizon; the in-order fast path GCs on processing time — "
            "pass idle_timeout_ms")
    return (
        with_host.select("host", "url", "warc_ts", "extracted_text")
        .groupBy("host")
        .applyInPandasWithState(
            _make_dedup_host(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                         if idle_timeout_ms is not None
                         else GroupStateTimeout.NoTimeout),
        )
    )

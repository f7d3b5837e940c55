"""Streaming sessionization == batch q_sessionize minus open sessions,
across micro-batch slicings."""

from __future__ import annotations

import datetime as dt

from ocr_hardsubx_spark.plans import dataset_queries as dq
from ocr_hardsubx_spark.streaming.stateful_sessions import (
    stateful_sessionize,
)
from tests.conftest import drain_stream

SCHEMA = "event_id long, ts timestamp, user_id long"
T0 = dt.datetime(2025, 3, 1, 12, 0, 0)


def _rows():
    """User 1: two sessions (gap 40 min between them), ids NOT
    time-monotone inside session 2 (extrema != endpoints); user 2: one
    session whose two events straddle EXACTLY the 30-min threshold
    (1800s gap is NOT a boundary — strictly greater closes); user 3: a
    single event."""
    m = dt.timedelta(minutes=1)
    return [
        (10, T0, 1), (11, T0 + 10 * m, 1),
        (13, T0 + 50 * m, 1), (12, T0 + 60 * m, 1),  # ids swap order
        (20, T0, 2), (21, T0 + 30 * m, 2),           # gap == 1800s: same
        (30, T0, 3),
    ]


def _stream_closed(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for batch in batches:
        spark.createDataFrame(batch, SCHEMA).repartition(1) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (stateful_sessionize(stream, watermark=None)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append")
             .start())
        drain_stream(q)
    return {(r["user_id"], r["session_no"]):
            (r["n_events"], r["first_event"], r["last_event"])
            for r in spark.read.parquet(out).collect()}


def _batch_minus_open(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    (spark.createDataFrame(rows, SCHEMA)
     .selectExpr("event_id", "ts", "user_id",
                 "'x' AS event_type", "0.0 AS value", "'' AS props")
     .coalesce(1).write.mode("overwrite").parquet(sf + "/events.parquet"))
    sessions = dq.q_sessionize(spark, sf).collect()
    last = {}
    for r in sessions:
        last[r["user_id"]] = max(last.get(r["user_id"], 0),
                                 r["session_no"])
    return {(r["user_id"], r["session_no"]):
            (r["n_events"], r["first_event"], r["last_event"])
            for r in sessions if r["session_no"] != last[r["user_id"]]}


def test_stream_closed_sessions_match_batch_single_batch(spark, tmp_path):
    rows = _rows()
    got = _stream_closed(spark, tmp_path, [rows])
    want = _batch_minus_open(spark, tmp_path, rows)
    assert got == want
    # semantics, not just agreement: exactly user 1's first session
    # closed — 2 events, ids 10..11 (users 2 and 3 stay open)
    assert want == {(1, 1): (2, 10, 11)}


def test_stream_closed_sessions_match_batch_sliced(spark, tmp_path):
    """The same rows split so the 40-min gap CROSSES a micro-batch
    boundary: the close must be detected from carried state."""
    rows = _rows()
    batches = [rows[:2] + rows[4:5],          # session 1 of user 1 + u2
               rows[2:4] + rows[5:6],         # session 2 arrives later
               rows[6:]]
    got = _stream_closed(spark, tmp_path, batches)
    want = _batch_minus_open(spark, tmp_path, rows)
    assert got == want


def test_extrema_not_endpoints(spark, tmp_path):
    """Within user 1's OPEN session the ids arrive 13 then 12; if it is
    later closed by a new event, the summary must report min/max (12,
    13) like the batch agg — force the close with a follow-up batch."""
    m = dt.timedelta(minutes=1)
    rows = _rows()
    later = [(14, T0 + 120 * m, 1)]           # closes user 1's session 2
    got = _stream_closed(spark, tmp_path, [rows, later])
    assert got[(1, 2)] == (2, 12, 13)

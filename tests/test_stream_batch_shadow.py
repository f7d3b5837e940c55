"""Streaming stateful dedup == batch shadow (verdict item 7).

The applyInPandasWithState operator's cross-batch prev-kept chain must be
exactly reproducible by the batch computation (batch_host_dedup), for any
slicing of the input into micro-batches.  This is the batch-equivalence
shadow that gives the streaming operator a full correctness check (the
registered q_stream_dedup_shadow adds the DuckDB value-hash on top).
"""

from __future__ import annotations

import datetime as dt

from ocr_hardsubx_spark.streaming.stateful_dedup import (
    batch_host_dedup,
    stateful_host_dedup,
)
from tests.conftest import drain_stream

SCHEMA = "url string, warc_ts timestamp, extracted_text string"
BOILER = "Same navigation heavy page content repeated on every fetch"
T0 = dt.datetime(2025, 1, 1)


def _rows():
    """Two hosts, refetches, a distinct article, an empty doc, and a
    near-duplicate (1-char edit) — every branch of the chain."""
    out = [
        (f"https://hostA.example/p/{i}", T0 + dt.timedelta(minutes=i), BOILER)
        for i in range(3)
    ]
    out += [
        ("https://hostA.example/p/8", T0 + dt.timedelta(minutes=8),
         "Completely different article text that must be kept"),
        ("https://hostA.example/p/9", T0 + dt.timedelta(minutes=9),
         "Completely different article text that must be kept!"),  # near-dup
        ("https://hostA.example/p/10", T0 + dt.timedelta(minutes=10), ""),
        ("https://hostA.example/p/11", T0 + dt.timedelta(minutes=11), BOILER),
        ("https://hostB.example/q/0", T0, BOILER),
        ("https://hostB.example/q/1", T0 + dt.timedelta(minutes=1),
         "Host B has its own independent chain of text"),
        # scheme-agnostic host extraction (round-2 advisory): http:// and
        # pathless URLs carry a REAL host — distinct hosts, same boiler
        # text, must both be kept (no shared '' state)
        ("http://hostC.example/r/0", T0, BOILER),
        ("https://hostD.example", T0 + dt.timedelta(minutes=1), BOILER),
        # unparseable URLs: pass through independently, never chained
        ("not-a-url-1", T0, BOILER),
        ("not-a-url-2", T0 + dt.timedelta(minutes=1), BOILER),
        ("not-a-url-3", T0 + dt.timedelta(minutes=2), ""),
    ]
    return out


def _stream_kept(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for batch in batches:
        spark.createDataFrame(batch, SCHEMA).repartition(1) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (stateful_host_dedup(stream, watermark=None)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append")
             .start())
        drain_stream(q)
    return {r["url"]: r["kept"] for r in spark.read.parquet(out).collect()}


def test_stream_equals_batch_single_batch(spark, tmp_path):
    rows = _rows()
    got = _stream_kept(spark, tmp_path, [rows])
    want = {r["url"]: r["kept"]
            for r in batch_host_dedup(
                spark.createDataFrame(rows, SCHEMA)).collect()}
    assert got == want
    # sanity on the semantics themselves, not just agreement
    assert want["https://hostA.example/p/0"] is True
    assert want["https://hostA.example/p/1"] is False
    assert want["https://hostA.example/p/8"] is True
    assert want["https://hostA.example/p/9"] is False   # near-dup suppressed
    assert want["https://hostA.example/p/10"] is False  # empty never kept
    assert want["https://hostA.example/p/11"] is True   # prev kept is article
    assert want["https://hostB.example/q/0"] is True
    # distinct hosts never suppress each other even with identical text
    assert want["http://hostC.example/r/0"] is True
    assert want["https://hostD.example"] is True
    # unparseable URLs pass through: non-empty kept, empty dropped
    assert want["not-a-url-1"] is True
    assert want["not-a-url-2"] is True
    assert want["not-a-url-3"] is False


def test_stream_equals_batch_across_micro_batches(spark, tmp_path):
    """The same rows sliced into 3 micro-batches (state crosses batches)
    must equal the one-shot batch computation."""
    rows = _rows()
    got = _stream_kept(spark, tmp_path, [rows[:3], rows[3:6], rows[6:]])
    want = {r["url"]: r["kept"]
            for r in batch_host_dedup(
                spark.createDataFrame(rows, SCHEMA)).collect()}
    assert got == want

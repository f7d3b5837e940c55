"""Crawl-native streaming ingest: WARC files landing incrementally."""

import os

from ocr_hardsubx_spark.sources.warc import (
    build_response_warc_blob, read_documents_warc)
from ocr_hardsubx_spark.streaming.extract_stream import (
    read_documents_warc_stream)


def _warc_file(path, urls):
    rows = [(u, "2025-01-01T00:00:0%dZ" % i, 200, b"text/html",
             ("<html>%s</html>" % u).encode(), {})
            for i, u in enumerate(urls)]
    with open(path, "wb") as f:
        f.write(build_response_warc_blob(rows))


def _drain(spark, src_dir, ckpt, out):
    """availableNow drain into a parquet sink (the memory sink cannot
    recover a checkpoint, which is the very contract under test)."""
    q = (read_documents_warc_stream(spark, src_dir)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    if not any(f.endswith(".parquet") for f in os.listdir(out)):
        return set()
    return {r.url for r in spark.read.parquet(out).collect()}


def test_stream_matches_batch_and_is_incremental(spark, tmp_path):
    src = tmp_path / "warcs"
    src.mkdir()
    _warc_file(src / "a.warc", ["https://a.example/1",
                                "https://a.example/2"])
    _warc_file(src / "b.warc", ["https://b.example/1"])
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(out)

    got1 = _drain(spark, str(src), ckpt, out)
    batch = {r.url
             for r in read_documents_warc(spark, str(src)).collect()}
    assert got1 == batch == {"https://a.example/1", "https://a.example/2",
                             "https://b.example/1"}

    # a third archive lands; the SAME checkpoint resumes and must
    # append ONLY the new archive's rows (exactly-once ingest)
    _warc_file(src / "c.warc", ["https://c.example/1"])
    got2 = _drain(spark, str(src), ckpt, out)
    assert got2 == got1 | {"https://c.example/1"}
    # ROW count pins no re-ingest: a replay of a/b would duplicate
    # rows without changing the url set
    assert spark.read.parquet(out).count() == 4


def test_stream_skips_damaged_archive(spark, tmp_path):
    src = tmp_path / "warcs"
    src.mkdir()
    _warc_file(src / "good.warc", ["https://ok.example/1"])
    (src / "bad.warc").write_bytes(b"\x1f\x8b not actually gzip")
    out = str(tmp_path / "out2")
    os.makedirs(out)
    got = _drain(spark, str(src), str(tmp_path / "ckpt2"), out)
    assert got == {"https://ok.example/1"}

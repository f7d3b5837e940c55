"""Spark plumbing for the PDF extraction stage: mapInPandas end-to-end,
plan shape (no per-row Python), provenance flags on bad payloads, and the
roundtrip against the documents fixture."""

import pandas as pd
import pytest

from ocr_hardsubx_spark.functions import pdf_codec
from ocr_hardsubx_spark.operators.pdftext import (
    FURNITURE_BAND,
    HEADER_TEXT,
    pdf_corpus_from_text,
    pdf_extract_table,
    synth_pages,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(64).cache())


def test_roundtrip_matches_source_chunks(spark, docs):
    pdfs = pdf_corpus_from_text(docs, chunk=120, per_page=5)
    out = pdf_extract_table(pdfs).toPandas().set_index("doc_id")
    src = docs.toPandas().set_index("doc_id")
    for doc_id, row in src.iterrows():
        text = row["text"]
        chunks = [text[i:i + 120] for i in range(0, len(text), 120)]
        want = "\n".join(chunks)
        got = out.loc[doc_id]
        assert got["extracted_text"] == want
        assert got["n_pages"] == (len(chunks) + 4) // 5
        assert bool(got["decoded_real"])


def test_furniture_strip_spark_path(spark, docs):
    pdfs = pdf_corpus_from_text(docs, chunk=60, per_page=2, furniture=True)
    out = pdf_extract_table(pdfs, strip=True, margin_band=FURNITURE_BAND) \
        .toPandas().set_index("doc_id")
    src = docs.toPandas().set_index("doc_id")
    for doc_id, row in src.iterrows():
        text = row["text"]
        chunks = [text[i:i + 60] for i in range(0, len(text), 60)]
        body = "\n".join(chunks)
        n_pages = (len(chunks) + 1) // 2
        want = body if n_pages >= 2 else HEADER_TEXT + "\n" + body
        assert out.loc[doc_id]["extracted_text"] == want


def test_xref_stream_corpus_roundtrip(spark, docs):
    """The reader path also handles PDF 1.5 xref-stream payloads at the
    operator level (write_pdf(xref_stream=True) inside the synth UDF)."""
    pdfs = pdf_corpus_from_text(docs.limit(8), chunk=120, per_page=5,
                                xref_stream=True)
    out = pdf_extract_table(pdfs).toPandas()
    assert out["decoded_real"].all()
    assert (out["n_pages"] >= 1).all()


def test_fused_roundtrip_equals_chained(spark, docs):
    """pdf_roundtrip_table (one fused stage, payloads never re-cross the
    Python boundary) must be row-identical to the chained
    write->extract composition it optimizes."""
    from ocr_hardsubx_spark.operators.pdftext import pdf_roundtrip_table

    chained = pdf_extract_table(
        pdf_corpus_from_text(docs, chunk=60, per_page=2, furniture=True),
        strip=True, margin_band=FURNITURE_BAND)
    fused = pdf_roundtrip_table(docs, chunk=60, per_page=2,
                                furniture=True, strip=True,
                                margin_band=FURNITURE_BAND)
    a = chained.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = fused.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1       # genuinely one stage
    assert "Exchange" not in plan


def test_plan_is_mapinpandas_only(spark, docs):
    pdfs = pdf_corpus_from_text(docs, chunk=120, per_page=5)
    out = pdf_extract_table(pdfs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan          # no per-row Python
    assert plan.count("Exchange") == 0            # zero-shuffle pipeline
    assert "MapInPandas" in plan


def test_bad_payloads_flagged_not_dropped(spark):
    good = pdf_codec.write_pdf([[(72, 700, 11, "fine")]])
    rows = [(1, bytearray(good)),
            (2, bytearray(b"GIF89a not a pdf")),
            (3, bytearray(good[:100])),            # truncated
            (4, bytearray(b""))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = pdf_extract_table(df).toPandas().set_index("doc_id").sort_index()
    assert bool(out.loc[1, "decoded_real"]) is True
    assert out.loc[1, "extracted_text"] == "fine"
    for bad in (2, 3, 4):
        assert bool(out.loc[bad, "decoded_real"]) is False
        assert out.loc[bad, "extracted_text"] is None or \
            pd.isna(out.loc[bad, "extracted_text"])
        assert out.loc[bad, "n_pages"] == 0
    assert len(out) == 4                           # nothing dropped


def test_synth_pages_layout_grid():
    pages = synth_pages("x" * 250, chunk=60, per_page=2, furniture=True)
    assert len(pages) == 3                         # ceil(ceil(250/60)/2)
    first = pages[0]
    assert first[0][3] == HEADER_TEXT and first[0][1] == 780.0
    assert first[-1][3] == "Page 1 of 3" and first[-1][1] == 24.0
    body_ys = [s[1] for s in first[1:-1]]
    assert body_ys == [648.0, 620.0]
    # body grid stays strictly inside the furniture margin band
    assert all(FURNITURE_BAND[0] < y < FURNITURE_BAND[1] for y in body_ys)

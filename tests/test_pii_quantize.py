"""PII scrubbing + int8 embedding quantization: hand-authored pins.

The cross-engine value gate is the DuckDB oracle (driver); these tests
pin the operator SEMANTICS on fixtures where the expected counts,
redactions, and error bounds are derived by hand.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ocr_hardsubx_spark.plans import dataset_queries as dq

SF = "/root/testdata/sf0.001"


def _scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    red = F.regexp_replace(F.col("t"), dq.PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, dq.PII_IPV4_RE, "<IP>")
    red = F.regexp_replace(red, dq.PII_PHONE_RE, "<PHONE>")
    row = df.select(
        F.size(F.regexp_extract_all("t", F.lit(dq.PII_EMAIL_RE),
                                    F.lit(0))).alias("e"),
        F.size(F.regexp_extract_all("t", F.lit(dq.PII_IPV4_RE),
                                    F.lit(0))).alias("i"),
        F.size(F.regexp_extract_all("t", F.lit(dq.PII_PHONE_RE),
                                    F.lit(0))).alias("p"),
        red.alias("red")).first()
    return row["e"], row["i"], row["p"], row["red"]


def test_pii_detection_and_redaction_hand_cases(spark):
    e, i, p, red = _scrub_one(
        spark, "mail a.b+c@x-y.co, server 192.168.0.1, tel +41 22 345 6789")
    assert (e, i, p) == (1, 1, 1)
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "a.b+c@x-y.co" not in red and "192.168.0.1" not in red

    # the digits inside an email or IP must not double-count as a phone
    e, i, p, _ = _scrub_one(spark, "u12345678@host.org and 10.0.0.17 only")
    assert (e, i, p) == (1, 1, 0)

    # dotted decimals in prose are not IPs unless 4 octets
    e, i, p, _ = _scrub_one(spark, "version 1.2.3 released")
    assert (e, i, p) == (0, 0, 0)


def test_pii_query_rows_and_lacing(spark):
    rows = {r["doc_id"]: r for r in dq.q_pii_scrub(spark, SF).collect()}
    total = spark.read.parquet(SF + "/documents.parquet").count()
    assert len(rows) == total
    for d, r in rows.items():
        m = d % 5
        want = {0: (1, 1, 0), 1: (0, 0, 1), 2: (1, 1, 1)}.get(m, (0, 0, 0))
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == want, d


def test_quantization_error_bound(spark):
    """Elementwise |err| <= 0.5/scale, so rmse <= 0.5/scale; scale
    matches 127/max|v| computed independently."""
    rows = {r["vec_id"]: r
            for r in dq.q_embed_quantize(spark, SF).collect()}
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(SF + "/embeddings.parquet")
           .limit(50).collect()}
    for vid, v in emb.items():
        r = rows[vid]
        want_scale = 127.0 / np.abs(v).max()
        assert abs(r["scale"] - round(want_scale, 4)) < 1e-9
        assert 0.0 <= r["rmse"] <= 0.5 / want_scale + 1e-9

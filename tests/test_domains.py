"""Registered-domain extraction (public-suffix-lite expression)."""

from pyspark.sql import functions as F

from ocr_hardsubx_spark.functions.domains import registered_domain

CASES = [
    ("www.shop.co.uk", "shop.co.uk"),
    ("a.b.c.news.com", "news.com"),
    ("blog.org", "blog.org"),
    ("cdn.media.com.au", "media.com.au"),
    ("deep.sub.gov.uk", "sub.gov.uk"),
    ("192.168.0.1", "192.168.0.1"),
    ("localhost", "localhost"),
    ("co.uk", "co.uk"),
    ("example.co.kr", "example.co.kr"),
    ("www.example.com.", "example.com"),
]


def test_registered_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    got = {r.host: r.rd
           for r in df.select(
               "host",
               registered_domain(F.col("host")).alias("rd")).collect()}
    assert got == dict(CASES)


def test_registered_domain_stays_in_codegen(spark):
    """The hot-path contract: a pure expression, no Python eval, no
    shuffle for the projection."""
    df = spark.createDataFrame([("www.a.co.uk",)], "host string")
    plan = df.select(registered_domain(F.col("host")).alias("rd")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan

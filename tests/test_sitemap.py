"""Sitemap XML parsing + the Spark extraction stage."""

from ocr_hardsubx_spark.operators.sitemap import (
    extract_sitemap_entries, parse_sitemap)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_urlset_with_namespace():
    xml = (f'<urlset {NS}><url><loc>https://a.example/1</loc>'
           '<lastmod>2025-01-05</lastmod></url>'
           '<url><loc> https://a.example/2 </loc></url></urlset>')
    assert parse_sitemap(xml.encode()) == (
        "urlset", [("https://a.example/1", "2025-01-05"),
                   ("https://a.example/2", None)])


def test_urlset_without_namespace():
    xml = b"<urlset><url><loc>https://a.example/x</loc></url></urlset>"
    assert parse_sitemap(xml) == ("urlset", [("https://a.example/x", None)])


def test_sitemapindex():
    xml = (f'<sitemapindex {NS}>'
           '<sitemap><loc>https://a.example/s1.xml</loc>'
           '<lastmod>2025-02-01T00:00:00Z</lastmod></sitemap>'
           '</sitemapindex>')
    assert parse_sitemap(xml.encode()) == (
        "sitemapindex",
        [("https://a.example/s1.xml", "2025-02-01T00:00:00Z")])


def test_entry_without_loc_skipped():
    xml = b"<urlset><url><lastmod>2025-01-01</lastmod></url></urlset>"
    assert parse_sitemap(xml) == ("urlset", [])


def test_unknown_root_and_damage():
    assert parse_sitemap(b"<rss><channel/></rss>") == (None, [])
    assert parse_sitemap(b"not xml at all <<<") == (None, [])
    assert parse_sitemap(b"") == (None, [])


def test_unexpected_children_ignored():
    xml = (b"<urlset><junk/><url><loc>https://a.example/1</loc>"
           b"<priority>0.5</priority></url></urlset>")
    assert parse_sitemap(xml) == ("urlset", [("https://a.example/1", None)])


def test_extract_stage(spark):
    rows = [
        ("a.example",
         "<urlset><url><loc>https://a.example/1</loc>"
         "<lastmod>2025-01-09</lastmod></url></urlset>"),
        ("b.example",
         "<sitemapindex><sitemap><loc>https://b.example/s1.xml</loc>"
         "</sitemap></sitemapindex>"),
        ("c.example", "damaged <<<"),
    ]
    df = spark.createDataFrame(rows, "host string, sitemap_xml string")
    got = {(r.host, r.kind, r.loc, r.lastmod)
           for r in extract_sitemap_entries(df, spark).collect()}
    assert got == {
        ("a.example", "urlset", "https://a.example/1", "2025-01-09"),
        ("b.example", "sitemapindex", "https://b.example/s1.xml", None),
    }


def test_extract_stage_plan_map_only(spark):
    df = spark.createDataFrame([("h", "<urlset/>")],
                               "host string, sitemap_xml string")
    plan = extract_sitemap_entries(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_xml_declaration_and_utf16():
    xml = (b'<?xml version="1.0" encoding="UTF-8"?>'
           b"<urlset><url><loc>https://a.example/1</loc></url></urlset>")
    assert parse_sitemap(xml) == ("urlset", [("https://a.example/1", None)])
    xml16 = ('<?xml version="1.0" encoding="UTF-16"?>'
             "<urlset><url><loc>https://a.example/w</loc></url></urlset>"
             ).encode("utf-16")
    assert parse_sitemap(xml16) == ("urlset",
                                    [("https://a.example/w", None)])

"""RFC 9309 robots.txt parsing + crawl-permission decision."""

import pytest

from ocr_hardsubx_spark.operators.robots import (
    compile_pattern, frontier_allowed, parse_robots, parse_robots_rules)


# --------------------------------------------------------------------------
# pattern compilation
# --------------------------------------------------------------------------

def test_compile_pattern_literals_escaped():
    assert compile_pattern("/a.b+c") == r"^/a\.b\+c"


def test_compile_pattern_wildcard_and_anchor():
    assert compile_pattern("/p/*.php$") == r"^/p/.*\.php$"


def test_compile_pattern_inner_dollar_is_literal():
    assert compile_pattern("/a$b") == r"^/a\$b"


# --------------------------------------------------------------------------
# parse_robots: group selection + rule extraction
# --------------------------------------------------------------------------

BODY = """\
# global crawlers
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: badbot
Disallow: /

User-agent: curationbot
User-agent: otherbot
Disallow: /tmp
Crawl-delay: 10
Allow: /tmp/keep
Sitemap: https://x.example/sitemap.xml
"""


def test_group_selection_specific_beats_star():
    assert parse_robots(BODY, "CurationBot/1.0") == [
        (False, "/tmp"), (True, "/tmp/keep")]


def test_group_selection_star_fallback():
    assert parse_robots(BODY, "somebot") == [
        (False, "/private"), (True, "/private/ok")]


def test_group_selection_longest_agent_match_wins():
    body = ("User-agent: bot\nDisallow: /a\n\n"
            "User-agent: curationbot\nDisallow: /b\n")
    # both are substrings of "curationbot/1.0"; the longer token wins
    assert parse_robots(body, "curationbot/1.0") == [(False, "/b")]


def test_stacked_user_agent_lines_share_rules():
    assert parse_robots(BODY, "otherbot") == [
        (False, "/tmp"), (True, "/tmp/keep")]


def test_empty_disallow_emits_no_rule():
    assert parse_robots("User-agent: *\nDisallow:\n", "x") == []


def test_unknown_directives_do_not_break_group():
    body = ("User-agent: *\nDisallow: /a\n"
            "Crawl-delay: 5\nAllow: /a/b\n")
    assert parse_robots(body, "x") == [(False, "/a"), (True, "/a/b")]


def test_damage_is_non_fatal():
    body = "﻿garbage line\nUser-agent *\nUser-agent: *\nDisallow: /x\n"
    # the colon-less User-agent line is skipped, the valid one parses
    assert parse_robots(body, "x") == [(False, "/x")]


def test_no_matching_group_means_no_rules():
    assert parse_robots("User-agent: badbot\nDisallow: /\n", "goodbot") == []


# --------------------------------------------------------------------------
# Spark stages
# --------------------------------------------------------------------------

def _rules(spark, rows):
    return parse_robots_rules(
        spark.createDataFrame(rows, "host string, robots_txt string"),
        "curationbot", spark)


def test_parse_robots_rules_stage(spark):
    rows = _rules(spark, [
        ("a.example", "User-agent: *\nDisallow: /p\nAllow: /p/q$\n"),
        ("b.example", "User-agent: badbot\nDisallow: /\n"),
    ]).collect()
    got = {(r.host, r.allow, r.pattern, r.regex, r.spec) for r in rows}
    assert got == {("a.example", False, "/p", "^/p", 2),
                   ("a.example", True, "/p/q$", "^/p/q$", 5)}


def _decide(spark, urls, robots_rows):
    rules = _rules(spark, robots_rows)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r.url: r.allowed
            for r in frontier_allowed(df, rules).collect()}


def test_frontier_longest_match_and_allow_tie(spark):
    robots = [("a.example",
               "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
               "Allow: /t\nDisallow: /t\n")]
    got = _decide(spark, [
        "https://a.example/p/x",       # /p disallow wins (only match)
        "https://a.example/p/ok/y",    # longer allow overrides
        "https://a.example/t/z",       # equal length: allow wins the tie
        "https://a.example/free",      # host has rules, none match
        "https://b.example/anything",  # host without robots rules
        "https://a.example",           # empty path normalizes to /
    ], robots)
    assert got == {
        "https://a.example/p/x": False,
        "https://a.example/p/ok/y": True,
        "https://a.example/t/z": True,
        "https://a.example/free": True,
        "https://b.example/anything": True,
        "https://a.example": True,
    }


def test_frontier_wildcard_and_anchor(spark):
    robots = [("a.example",
               "User-agent: *\nDisallow: /*?sponsored=\n"
               "Disallow: /*.pdf$\n")]
    got = _decide(spark, [
        "https://a.example/x?sponsored=1",
        "https://a.example/doc.pdf",
        "https://a.example/doc.pdfx",   # $ anchor: not blocked
        "https://a.example/doc",
    ], robots)
    assert got == {
        "https://a.example/x?sponsored=1": False,
        "https://a.example/doc.pdf": False,
        "https://a.example/doc.pdfx": True,
        "https://a.example/doc": True,
    }


def test_frontier_blanket_disallow(spark):
    robots = [("a.example", "User-agent: *\nDisallow: /\n")]
    got = _decide(spark, ["https://a.example/", "https://a.example/x"],
                  robots)
    assert got == {"https://a.example/": False,
                   "https://a.example/x": False}


def test_frontier_plan_is_join_plus_aggregate(spark):
    """No window node, no per-row Python: the decision must stay a
    join + max_by aggregation."""
    rules = _rules(spark, [("a.example", "User-agent: *\nDisallow: /p\n")])
    urls = spark.createDataFrame([("https://a.example/p",)], "url string")
    plan = frontier_allowed(urls, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# Sitemap: directive (group-independent, RFC 9309 §2.3)
# --------------------------------------------------------------------------

def test_sitemap_directive_collected_from_any_group():
    from ocr_hardsubx_spark.operators.robots import parse_robots_sitemaps

    body = ("User-agent: badbot\nDisallow: /\n"
            "Sitemap: https://a.example/s1.xml\n"
            "User-agent: *\nDisallow: /x\n"
            "sitemap: https://a.example/s2.xml  # trailing comment\n"
            "Sitemap:\n")
    assert parse_robots_sitemaps(body) == [
        "https://a.example/s1.xml", "https://a.example/s2.xml"]


def test_sitemap_directive_does_not_leak_into_rules():
    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: https://a.example/s.xml\nAllow: /x/y\n")
    assert parse_robots(body, "anybot") == [(False, "/x"), (True, "/x/y")]


def test_extract_robots_sitemaps_stage(spark):
    from ocr_hardsubx_spark.operators.robots import extract_robots_sitemaps

    df = spark.createDataFrame(
        [("a.example", "Sitemap: https://a.example/s.xml\n"),
         ("b.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    got = {(r.host, r.sitemap_url)
           for r in extract_robots_sitemaps(df, spark).collect()}
    assert got == {("a.example", "https://a.example/s.xml")}


# --------------------------------------------------------------------------
# Crawl-delay (de-facto extension)
# --------------------------------------------------------------------------

def test_crawl_delay_group_scoped():
    from ocr_hardsubx_spark.operators.robots import parse_crawl_delay

    body = ("User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
            "User-agent: curationbot\nCrawl-delay: 0.5\n")
    assert parse_crawl_delay(body, "curationbot") == 0.5
    assert parse_crawl_delay(body, "otherbot") == 2.0


def test_crawl_delay_default_and_damage():
    from ocr_hardsubx_spark.operators.robots import parse_crawl_delay

    assert parse_crawl_delay("User-agent: *\nDisallow: /\n", "x") == 1.0
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n",
                             "x") == 1.0
    assert parse_crawl_delay("", "x", default=3.0) == 3.0
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -5\n",
                             "x") == 0.0


def test_extract_crawl_delays_stage(spark):
    from ocr_hardsubx_spark.operators.robots import extract_crawl_delays

    df = spark.createDataFrame(
        [("a.example", "User-agent: *\nCrawl-delay: 4\n"),
         ("b.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    got = {r.host: r.delay_s
           for r in extract_crawl_delays(df, "curationbot",
                                         spark).collect()}
    assert got == {"a.example": 4.0, "b.example": 1.0}

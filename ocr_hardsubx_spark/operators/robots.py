"""robots.txt crawl-permission evaluation (RFC 9309).

The crawl-frontier query (``plans/dataset_queries.q_crawl_frontier``)
answers "what could we fetch next"; this module answers "what are we
ALLOWED to fetch".  A crawler joins the two before scheduling — Common
Crawl publishes its robots.txt captures as a first-class dataset for
exactly this reason.

Two stages, split so the per-byte work and the per-url work scale
independently:

1. ``parse_robots_rules`` — an Arrow-batched ``mapInPandas`` stage over
   the ROBOTS corpus (one row per host: orders of magnitude smaller
   than the page corpus).  A from-spec RFC 9309 parser selects the
   rule group for our user-agent (longest agent-token match,
   case-insensitive, ``*`` fallback; multiple ``User-agent`` lines
   stack onto one group), and each Allow/Disallow line becomes one
   narrow rule row ``(host, allow, pattern, regex, spec)`` where
   ``regex`` is the pattern compiled to an anchored regular expression
   (``*`` -> ``.*``, trailing ``$`` -> end anchor, everything else
   escaped — the escape set is the RE2/Java-regex COMMON subset so the
   same string means the same thing to Spark and DuckDB) and ``spec``
   is the RFC's specificity (octet length of the pattern).

2. ``frontier_allowed`` — the DECISION, pure JVM: join candidate urls
   to rules on host (the robots side is host-level — broadcast at
   sandbox scale, an ordinary shuffle join on host at 10^8 hosts,
   never corpus x rules), keep rules whose regex matches the url path
   (``regexp_like`` with a per-row pattern column stays JVM-side), and
   pick the winner per url with ONE ``max_by`` aggregation on the
   struct ``(spec, allow)`` — longest pattern wins, allow wins ties,
   exactly RFC 9309 §2.2.2.  Urls whose host has no matching rule (or
   no robots.txt at all) are allowed, via the left join's NULL arm.
   No window functions, no per-row Python: the whole decision is a
   join + aggregate that AQE can re-plan.

Reference anchor: the reference pipeline (erfilter.c) has no crawl
layer; this family is part of the web-scale curation surface the north
rule adds around the extraction core, alongside the link-graph family
(``operators/linkgraph.py``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

RULE_SCHEMA = ("host string, allow boolean, pattern string, "
               "regex string, spec int")

#: characters escaped when compiling a robots path pattern to a regex.
#: Deliberately the subset with identical meaning in Java regex (Spark)
#: and RE2 (DuckDB); robots patterns are url paths, so this covers
#: every metacharacter that can legally appear in one.
_REGEX_SPECIALS = set(".^$+?()[]{}|\\")


def compile_pattern(pattern: str) -> str:
    """Robots path pattern -> anchored regex string (RFC 9309 §2.2.3:
    ``*`` matches any run of octets, a trailing ``$`` anchors the end;
    an inner ``$`` is literal)."""
    body, end_anchor = pattern, False
    if body.endswith("$"):
        body, end_anchor = body[:-1], True
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _REGEX_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if end_anchor:
        out.append("$")
    return "".join(out)


def _parse_groups(text: str) -> list:
    """robots.txt body -> ``[(agents, rules, crawl_delay)]`` per group.
    Rule lines attach to the most recent run of ``User-agent`` lines;
    unknown directives are ignored but do not break a group; empty
    Disallow emits no rule; damage (stray lines, missing colons, a
    UTF-8 BOM) is non-fatal."""
    groups: list[tuple[list, list, object]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay = None
    in_agent_run = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw_line in text.lstrip("﻿").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                flush()
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if value:
                cur_rules.append((field == "allow", value))
        elif field == "crawl-delay":
            in_agent_run = False
            try:
                cur_delay = float(value)
            except ValueError:
                pass                    # malformed delay: ignore
        else:
            in_agent_run = False        # unknown directive ends the run
    flush()
    return groups


def _select_group(groups: list, agent: str):
    """RFC 9309 group selection: the group whose agent token is the
    LONGEST case-insensitive substring match of our product token,
    falling back to ``*``; None when nothing matches."""
    agent_l = agent.lower()
    best_len, best = -1, None
    for group in groups:
        for a in group[0]:
            if a == "*":
                match_len = 0
            elif a and a in agent_l:
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best_len, best = match_len, group
    return best


def parse_robots(text: str, agent: str) -> list:
    """robots.txt body -> ``[(allow, pattern)]`` for ``agent``
    (see _parse_groups/_select_group for the grammar and selection)."""
    group = _select_group(_parse_groups(text), agent)
    return group[1] if group else []


def parse_crawl_delay(text: str, agent: str,
                      default: float = 1.0) -> float:
    """The selected group's ``Crawl-delay`` seconds (a de-facto
    extension most crawlers honor; not in RFC 9309), or ``default``
    when absent/malformed — the politeness dial per host."""
    group = _select_group(_parse_groups(text), agent)
    if group and group[2] is not None:
        return max(0.0, group[2])      # a negative delay clamps to 0
    return default


def parse_robots_rules(robots: "DataFrame", agent: str,
                       spark: "SparkSession" = None) -> "DataFrame":
    """(host, robots_txt) -> one row per Allow/Disallow rule of the
    group selected for ``agent``; hosts whose file yields no rules for
    us emit nothing (their urls fall out allowed via the left join)."""
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_hardsubx_spark.operators.robots import (
            compile_pattern, parse_robots)

        for pdf in batches:
            hosts, allows, pats, regexes, specs = [], [], [], [], []
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                for allow, pattern in parse_robots(body or "", agent):
                    hosts.append(host)
                    allows.append(allow)
                    pats.append(pattern)
                    regexes.append(compile_pattern(pattern))
                    specs.append(len(pattern))
            yield pd.DataFrame({"host": hosts, "allow": allows,
                                "pattern": pats, "regex": regexes,
                                "spec": specs})

    return (robots.select("host", "robots_txt")
            .mapInPandas(gen, RULE_SCHEMA))


def frontier_allowed(urls: "DataFrame", rules: "DataFrame",
                     broadcast_rules: bool = True) -> "DataFrame":
    """(url) x (host rules) -> (url, allowed).

    ``urls`` needs a ``url`` column; host + path are derived JVM-side.
    Longest-match / allow-wins-tie via one ``max_by`` on the struct
    ``(spec, allow)`` — struct comparison is lexicographic, so a longer
    pattern always beats a shorter one and at equal length the allow
    row (true > false) wins.  ``broadcast_rules`` fits the host-level
    rule table of this sandbox; at 10^8 hosts pass False and the join
    becomes a plain shuffle on host (still rules-sized, never
    corpus x rules).
    """
    parts = urls.select(
        "url",
        F.regexp_replace("url", r"^https?://([^/]*).*$", r"$1")
         .alias("host"),
        F.regexp_replace("url", r"^https?://[^/]*", "").alias("path"),
    ).withColumn("path", F.when(F.col("path") == "", "/")
                          .otherwise(F.col("path")))
    r = F.broadcast(rules) if broadcast_rules else rules
    hit = (F.col("regex").isNotNull() &
           F.regexp_like("path", F.col("regex")))
    # non-matching / rule-less rows keep the url alive with a NULL
    # ordering key; max_by skips NULL keys, so "no rule matched"
    # surfaces as best_allow IS NULL -> allowed (RFC 9309 default)
    return (parts.join(r, "host", "left")
            .groupBy("url")
            .agg(F.max_by(F.when(hit, F.col("allow")),
                          F.when(hit, F.struct("spec", "allow")))
                  .alias("best_allow"))
            .select("url",
                    F.coalesce("best_allow", F.lit(True))
                     .alias("allowed")))


def parse_robots_sitemaps(text: str) -> list:
    """All ``Sitemap:`` directive urls in a robots.txt body.  Per RFC
    9309 §2.3 the directive is GROUP-INDEPENDENT (it applies regardless
    of which user-agent group it sits near), so this collects every
    occurrence — the bootstrap a crawler uses to find a host's sitemaps
    without guessing /sitemap.xml."""
    out = []
    for raw_line in text.lstrip("﻿").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


def extract_robots_sitemaps(robots: "DataFrame",
                            spark: "SparkSession" = None) -> "DataFrame":
    """(host, robots_txt) -> one (host, sitemap_url) row per Sitemap:
    directive; zero-shuffle mapInPandas over the host-level corpus."""
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_hardsubx_spark.operators.robots import (
            parse_robots_sitemaps)

        for pdf in batches:
            hosts, urls = [], []
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                for u in parse_robots_sitemaps(body or ""):
                    hosts.append(host)
                    urls.append(u)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return (robots.select("host", "robots_txt")
            .mapInPandas(gen, "host string, sitemap_url string"))


def extract_crawl_delays(robots: "DataFrame", agent: str,
                         spark: "SparkSession" = None) -> "DataFrame":
    """(host, robots_txt) -> (host, delay_s) for the group selected
    for ``agent`` (default 1.0 where unspecified); zero-shuffle
    mapInPandas over the host-level corpus."""
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_hardsubx_spark.operators.robots import parse_crawl_delay

        for pdf in batches:
            hosts, delays = [], []
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                hosts.append(host)
                delays.append(parse_crawl_delay(body or "", agent))
            yield pd.DataFrame({"host": hosts, "delay_s": delays})

    return (robots.select("host", "robots_txt")
            .mapInPandas(gen, "host string, delay_s double"))

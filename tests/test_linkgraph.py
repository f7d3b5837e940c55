"""Link-graph family: href collection, urljoin/scheme semantics,
PageRank power iteration (dangling correction, mass conservation,
pure-Python mirror)."""

from __future__ import annotations

import pytest

from ocr_hardsubx_spark.operators.linkgraph import (
    FINAL_ROUND, STEP_ROUND, _LinkCollector, extract_outlinks, link_graph,
    pagerank_hosts)


# --------------------------------------------------------------------------
# _LinkCollector (pure kernel)
# --------------------------------------------------------------------------

def _collect(html: bytes, base: str = "https://a.example/p"):
    return _LinkCollector().collect(html, base)


def test_collector_basic_and_anchor_text():
    out = _collect(b'<a href="https://b.example/x">go <b>deep</b> now</a>')
    assert out == [("https://b.example/x", "b.example", "go deep now",
                    False)]


def test_collector_unquoted_and_singlequoted_attrs():
    out = _collect(b"<a href=https://b.example/u>u</a>"
                   b"<a href='https://c.example/s'>s</a>")
    assert [(h, a) for _, h, a, _nf in out] == [("b.example", "u"),
                                                ("c.example", "s")]


def test_collector_relative_resolved_against_base():
    out = _collect(b'<a href="/about">About</a>'
                   b'<a href="sibling.html">Sib</a>',
                   base="https://a.example/dir/page.html")
    assert out[0] == ("https://a.example/about", "a.example", "About",
                      False)
    assert out[1] == ("https://a.example/dir/sibling.html", "a.example",
                      "Sib", False)


def test_collector_drops_non_http_schemes():
    out = _collect(b'<a href="mailto:x@y.z">mail</a>'
                   b'<a href="javascript:void(0)">js</a>'
                   b'<a href="ftp://f.example/a">ftp</a>'
                   b'<a href="https://ok.example/">ok</a>')
    assert [h for _, h, _, _nf in out] == ["ok.example"]


def test_collector_charrefs_and_nested_anchor_damage():
    # entity in anchor text; a nested (illegal) <a> must not crash and
    # an href-less <a> contributes no row
    out = _collect(b'<a href="https://b.example/">A &amp; B'
                   b"<a>inner</a></a>")
    assert out[0][2].startswith("A & B")


def test_collector_survives_garbage():
    assert _collect(b"\xff\xfe<<<a href=") == []


# --------------------------------------------------------------------------
# Spark stages
# --------------------------------------------------------------------------

def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary")


def test_extract_outlinks_stage(spark):
    pages = _pages(spark, [
        ("https://a.example/1",
         '<a href="https://b.example/x">to b</a><a href="/self">me</a>'),
        ("https://b.example/1", '<a href="mailto:n@o.p">none</a>'),
    ])
    got = {(r.src_host, r.dst_host, r.anchor)
           for r in extract_outlinks(pages, spark).collect()}
    assert got == {("a.example", "b.example", "to b"),
                   ("a.example", "a.example", "me")}


def test_link_graph_weights(spark):
    pages = _pages(spark, [
        ("https://a.example/1",
         '<a href="https://b.example/">1</a><a href="https://b.example/">2'
         '</a><a href="https://c.example/">3</a>'),
    ])
    rows = {(r.src_host, r.dst_host): (r.n_links, r.weight)
            for r in link_graph(extract_outlinks(pages, spark)).collect()}
    assert rows[("a.example", "b.example")] == (2, pytest.approx(2 / 3))
    assert rows[("a.example", "c.example")] == (1, pytest.approx(1 / 3))


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

def _pr_mirror(edges, iters=5, damping=0.85):
    """Pure-Python power iteration with the operator's exact rounding."""
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(hosts)
    outdeg = {}
    w = {}
    for s, d in edges:
        w[(s, d)] = w.get((s, d), 0) + 1
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {h: round(1.0 / n, STEP_ROUND) for h in hosts}
    srcs = set(outdeg)
    for _ in range(iters):
        dang = sum(pr[h] for h in hosts if h not in srcs)
        base = (1.0 - damping) / n + damping * dang / n
        mass = {h: 0.0 for h in hosts}
        for (s, d), k in w.items():
            mass[d] += pr[s] * (k / outdeg[s])
        pr = {h: round(base + damping * mass[h], STEP_ROUND) for h in hosts}
    return {h: round(pr[h], FINAL_ROUND) for h in hosts}


def _links_df(spark, edges):
    return spark.createDataFrame(
        [(f"https://{s}/p", s, d, "") for s, d in edges],
        "url string, src_host string, dst_host string, anchor string")


def test_pagerank_matches_mirror_and_conserves_mass(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "a"),
             ("a", "b")]
    got = {r.host: r.pr
           for r in pagerank_hosts(_links_df(spark, edges)).collect()}
    assert got == _pr_mirror(edges)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_dangling_host_conserves_mass(spark):
    # b has NO outlinks: its mass must be redistributed, not lost
    edges = [("a", "b"), ("c", "b"), ("c", "a")]
    got = {r.host: r.pr
           for r in pagerank_hosts(_links_df(spark, edges)).collect()}
    assert got == _pr_mirror(edges)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # the dangling sink still accumulates the most rank
    assert max(got, key=got.get) == "b"


def test_pagerank_self_loop(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a")]
    got = {r.host: r.pr
           for r in pagerank_hosts(_links_df(spark, edges)).collect()}
    assert got == _pr_mirror(edges)


def test_pagerank_deterministic(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = _links_df(spark, edges)
    r1 = {r.host: r.pr for r in pagerank_hosts(df).collect()}
    r2 = {r.host: r.pr for r in pagerank_hosts(df).collect()}
    assert r1 == r2


def test_outlinks_plan_is_mapinpandas_only(spark):
    pages = _pages(spark, [("https://a.example/1",
                            '<a href="https://b.example/x">b</a>')])
    out = extract_outlinks(pages, spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan          # no per-row Python
    assert plan.count("Exchange") == 0            # zero-shuffle stage
    assert "MapInPandas" in plan


def test_outlinks_emits_resolved_target_url(spark):
    pages = _pages(spark, [("https://a.example/dir/page",
                            '<a href="../up">Up</a>')])
    rows = extract_outlinks(pages, spark).collect()
    assert rows[0].dst_url == "https://a.example/up"


# --------------------------------------------------------------------------
# nofollow + robots meta
# --------------------------------------------------------------------------

def test_collector_rel_nofollow_flag():
    out = _collect(
        b'<a href="https://b.example/" rel="nofollow">sp</a>'
        b'<a href="https://c.example/" rel="sponsored nofollow ugc">m</a>'
        b'<a href="https://d.example/" rel="author">ok</a>'
        b'<a href="https://e.example/">plain</a>')
    assert [(h, nf) for _, h, _, nf in out] == [
        ("b.example", True), ("c.example", True),
        ("d.example", False), ("e.example", False)]


def test_link_graph_excludes_nofollow_edges(spark):
    pages = _pages(spark, [
        ("https://a.example/1",
         '<a href="https://b.example/">f</a>'
         '<a href="https://spam.example/" rel="nofollow">s</a>'),
    ])
    links = extract_outlinks(pages, spark)
    # visible in the outlink table ...
    assert {r.dst_host for r in links.collect()} == \
        {"b.example", "spam.example"}
    # ... excluded from the transition graph
    edges = link_graph(links).collect()
    assert {r.dst_host for r in edges} == {"b.example"}
    assert edges[0].weight == pytest.approx(1.0)


def test_meta_robots_kernel():
    from ocr_hardsubx_spark.operators.linkgraph import collect_meta_robots

    assert collect_meta_robots(
        b'<meta name="robots" content="noindex, follow">') == (True, False)
    assert collect_meta_robots(
        b'<META NAME="ROBOTS" CONTENT="NONE">') == (True, True)
    assert collect_meta_robots(
        b'<meta name="robots" content="nofollow">') == (False, True)
    assert collect_meta_robots(b'<meta name="viewport" content="w">') == \
        (False, False)
    assert collect_meta_robots(b"\xff garbage <meta") == (False, False)


def test_extract_page_flags_stage(spark):
    from ocr_hardsubx_spark.operators.linkgraph import extract_page_flags

    pages = _pages(spark, [
        ("https://a.example/1",
         '<head><meta name="robots" content="noindex"></head><body>x'),
        ("https://a.example/2", "<body>indexable</body>"),
    ])
    got = {r.url: (r.noindex, r.nofollow_page)
           for r in extract_page_flags(pages, spark).collect()}
    assert got == {"https://a.example/1": (True, False),
                   "https://a.example/2": (False, False)}

"""Deterministic synthetic web-page corpus (FIXTURES.md).

Generates ``documents(url, warc_ts, html, text, lang)`` rows per
BASELINE.json's input_hint: Common-Crawl-style pages assembled from a
seeded template grammar (seed=42, per-row PRNG -> byte-reproducible at any
scale, in any generation order).  The golden ``text`` column is the oracle
output of ``refimpl.extract_document`` on the page's html — the pipeline
must reproduce it byte-identically per url.

Case families are tagged in the url path (``/det-*/``, ``/dedup-*/``,
``/norm-*/``, ``/skew-*/``, ``/prune-*/``) so pytest suites can select
cases with a ``WHERE url LIKE`` filter.  Hosts follow a Zipf(1.2)
distribution over 64 hosts (host0000 is the mega-host) to exercise the
salting path.
"""

from __future__ import annotations

import datetime as dt
import os
import random

_WORDS = (
    "data spark engine pipeline document region content extraction scale "
    "partition shuffle broadcast classifier feature threshold cascade text "
    "density boilerplate cluster executor throughput parquet column batch "
    "vectorized arrow schema query plan filter aggregate window join table "
    "stream checkpoint manifest lineage resume byte identical golden oracle"
).split()

_NAV_WORDS = ("Home About Contact Products Services Blog News Careers Team "
              "Support Pricing Docs Legal Privacy Terms Partners Press FAQ").split()

N_HOSTS = 64
ZIPF_S = 1.2
EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_FAMILIES = ("det-main", "det-nest", "det-embed", "det-bound", "det-mixed",
             "dedup-nav", "dedup-footer", "dedup-empty", "dedup-brbr",
             "norm-entity", "skew-host", "prune-day")


def _zipf_host(rng: random.Random) -> int:
    """Inverse-CDF sample from Zipf(s) over N_HOSTS ranks."""
    weights = [1.0 / (k ** ZIPF_S) for k in range(1, N_HOSTS + 1)]
    total = sum(weights)
    u = rng.random() * total
    acc = 0.0
    for i, w in enumerate(weights):
        acc += w
        if u <= acc:
            return i
    return N_HOSTS - 1


def _sentence(rng: random.Random, lo=6, hi=14) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(ws).capitalize() + "."


def _paragraph(rng: random.Random, inline=True) -> str:
    sents = [_sentence(rng) for _ in range(rng.randint(2, 5))]
    if inline and rng.random() < 0.5:
        k = rng.randrange(len(sents))
        tag = rng.choice(["b", "i", "em"])
        sents[k] = f"<{tag}>{sents[k]}</{tag}>"
    if inline and rng.random() < 0.3:
        sents.append(f'See <a href="/ref{rng.randint(0, 99)}">{rng.choice(_WORDS)}</a> for more.')
    return "<p>" + " ".join(sents) + "</p>"


def _main_content(rng: random.Random) -> str:
    ps = [_paragraph(rng) for _ in range(rng.randint(2, 8))]
    return '<div class="content">' + "".join(ps) + "</div>"


def _nav_items(rng: random.Random) -> list[str]:
    n = rng.randint(5, 15)
    return [rng.choice(_NAV_WORDS) + " " + rng.choice(_NAV_WORDS).lower()
            for _ in range(n)]


def _nav(items: list[str]) -> str:
    lis = "".join(f'<li><a href="/{w.split()[0].lower()}">{w}</a></li>'
                  for w in items)
    return f"<nav><ul>{lis}</ul></nav>"


def _footer(rng: random.Random, items: list[str]) -> str:
    """Near-duplicate of the nav with 1-2 token edits (dedup boundary)."""
    edited = list(items)
    for _ in range(rng.randint(1, 2)):
        k = rng.randrange(len(edited))
        edited[k] = edited[k] + "!"
    links = " ".join(f'<a href="/f{j}">{w}</a>' for j, w in enumerate(edited))
    return f"<footer>{links}</footer>"


def _empty_ws() -> str:
    return "<div>   \n\n  </div><p></p><div>\t</div>"


def _double_enter(rng: random.Random) -> str:
    a, b = _sentence(rng), _sentence(rng)
    return f"<p>{a}<br><br><br>{b}</p>"


def _deep_nesting(rng: random.Random) -> str:
    depth = rng.randint(6, 12)
    core = _paragraph(rng, inline=False)
    return "<div>" * depth + core + "</div>" * depth


def _embedded_nontext(rng: random.Random) -> str:
    p1 = _paragraph(rng, inline=False)
    p2 = _paragraph(rng, inline=False)
    return ('<div class="content">' + p1
            + "<script>function f(){return 42;}</script>"
            + '<img src="/x.png">' + p2
            + "<iframe src='/ad'></iframe></div>")


def _boundary(rng: random.Random) -> str:
    """Block engineered near the stage-1 link-density zero crossing (~0.42):
    mixed text+links whose accept/reject is decided by the pinned stumps."""
    words = [rng.choice(_WORDS) for _ in range(rng.randint(8, 16))]
    half = len(words) // 2
    linked = " ".join(f'<a href="/b{j}">{w}</a>' for j, w in enumerate(words[:half]))
    plain = " ".join(words[half:])
    return f"<p>{linked} {plain}</p>"


def build_page(i: int, seed: int = 42) -> tuple[str, str, str]:
    """Returns (url, html, family) for row i — deterministic per (i, seed)."""
    rng = random.Random(seed * 1_000_003 + i)
    family = _FAMILIES[i % len(_FAMILIES)]
    host = 0 if family == "skew-host" else _zipf_host(rng)
    url = f"https://host{host:04d}.example/{family}/{i:06d}"

    items = _nav_items(rng)
    nav = _nav(items)
    blocks: list[str] = [nav]

    if family == "det-main":
        blocks += [_main_content(rng)]
    elif family == "det-nest":
        blocks += [_deep_nesting(rng), _main_content(rng)]
    elif family == "det-embed":
        blocks += [_embedded_nontext(rng)]
    elif family == "det-bound":
        blocks += [_main_content(rng), _boundary(rng)]
    elif family == "det-mixed":
        # mixed container: content + small nav + content under ONE div —
        # exercises stage-2 child recovery (rejected container must not
        # black-hole its clean children)
        small_nav = _nav(_nav_items(rng)[:4])
        blocks += ["<div class='wrap'>" + _paragraph(rng) + small_nav
                   + _paragraph(rng) + "</div>"]
    elif family == "dedup-nav":
        reps = rng.randint(2, 4)
        blocks += [_main_content(rng)] + [nav] * reps
    elif family == "dedup-footer":
        blocks += [_main_content(rng), nav, _footer(rng, items)]
    elif family == "dedup-empty":
        blocks += [_empty_ws(), _main_content(rng), _empty_ws()]
    elif family == "dedup-brbr":
        blocks += [_double_enter(rng), _main_content(rng)]
    elif family == "norm-entity":
        s = _sentence(rng)
        blocks += [f"<p>{s} &amp;\xa0&#x2014; x &lt;tag&gt;   y\r\nz  w</p>",
                   _main_content(rng)]
    else:  # skew-host, prune-day: ordinary content pages
        blocks += [_main_content(rng)]

    blocks.append(_footer(rng, items))
    title = _sentence(rng, 2, 5)
    html = ("<html><head><title>" + title + "</title>"
            "<style>body{margin:0}</style></head><body>"
            + "\n".join(blocks) + "</body></html>")
    return url, html, family


def generate_rows(n: int, seed: int = 42, start: int = 0):
    """Yield dict rows with golden text from the refimpl oracle."""
    from ..refimpl import extract_document

    langs = ["en", "de", "fr", "es"]
    for i in range(start, start + n):
        url, html, family = build_page(i, seed)
        golden = extract_document(html)["extracted_text"]
        yield {
            "url": url,
            # 3607s stride: 200 rows span ~8.3 distinct days (FIXTURES.md:
            # multi-day warc_ts so partition pruning is testable); wrapped
            # at 30 days so large bench corpora keep a bounded partition
            # count (identical values for corpora <= ~700 rows)
            "warc_ts": EPOCH + dt.timedelta(
                seconds=(3607 * i) % (30 * 86400)),
            "html": html.encode("utf-8"),
            "text": golden,
            "lang": langs[i % 4],
        }


def write_documents(path: str, n: int, seed: int = 42,
                    partition_by_day: bool = False) -> str:
    """Write the corpus as parquet. With partition_by_day=True, writes a
    directory layout partitioned on warc_dt=date(warc_ts) — the parquet
    stand-in for Iceberg partition pruning on warc_ts (SURVEY.md §7.6)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(generate_rows(n, seed))
    table = pa.table({
        "url": [r["url"] for r in rows],
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            type=pa.timestamp("us", tz="UTC")),
        "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
    })
    if partition_by_day:
        import pyarrow.dataset as ds
        table = table.append_column(
            "warc_dt", pa.array([r["warc_ts"].date() for r in rows]))
        os.makedirs(path, exist_ok=True)
        ds.write_dataset(table, path, format="parquet",
                         partitioning=ds.partitioning(
                             pa.schema([("warc_dt", pa.date32())]),
                             flavor="hive"),
                         existing_data_behavior="delete_matching")
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pq.write_table(table, path)
    return path

"""Webtext rule filters (Gopher / C4), the deterministic shard shuffle,
and BPE tokenizer training — round-6 additions.  A pure-Python mirror of
the synthesized page + both rule sets pins the semantics independently
of the DuckDB oracle; BPE's two-pass anchored replace is pinned against
a pure-Python reference including the self-pair-run edge case; oracle
parity at sf0.01 rides the entry-contract gate like every other
registered query."""

from __future__ import annotations

import math
import re

import pytest

from ocr_hardsubx_spark.plans import dataset_queries as dq

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Pure-Python mirror of the synthesized page (the cross-engine contract)
# ---------------------------------------------------------------------------


def _r4(x: float) -> float:
    """Spark/DuckDB round() is HALF_UP; Python's round() is banker's."""
    return math.floor(x * 10000 + 0.5) / 10000


def _page_lines(doc_id: int, text: str) -> list[str]:
    toks = text.split(" ")
    n_lines = math.ceil(len(toks) / dq.PAGE_LINE_TOKS)
    out = []
    for j in range(n_lines):
        b = " ".join(toks[j * dq.PAGE_LINE_TOKS:(j + 1) * dq.PAGE_LINE_TOKS])
        m = (doc_id + j) % 7
        if m == 0:
            out.append("- " + b)
        elif m == 1:
            out.append(b + " ...")
        elif m == 2:
            out.append(b + " { enable javascript and cookies }")
        elif m == 3:
            out.append("note that the " + b + ".")
        else:
            out.append(b + ".")
    return out


def _docs_rows(spark):
    return spark.read.parquet(SF + "/documents.parquet") \
        .select("doc_id", "text").collect()


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------


def test_gopher_matches_pure_python_mirror(spark):
    """Every stat and the keep decision match a from-scratch Python
    reimplementation of Rae et al. table A1 over the synthesized page,
    for the full sf0.001 corpus."""
    got = {r["doc_id"]: r for r in dq.q_gopher_rules(spark, SF).collect()}
    rows = _docs_rows(spark)
    assert len(got) == len(rows)
    for r in rows:
        lines = _page_lines(r["doc_id"], r["text"])
        ws = [w for line in lines for w in line.split(" ")]
        n_words = len(ws)
        mean_wl = _r4(sum(len(w) for w in ws) / n_words)
        fr_sym = _r4(
            sum(1 for w in ws if "#" in w or "..." in w) / n_words)
        fr_alpha = _r4(
            sum(1 for w in ws if re.search("[A-Za-z]", w)) / n_words)
        n_stops = len(set(ws) & set(dq.GOPHER_STOPS))
        fr_bullet = _r4(
            sum(1 for l in lines if l.startswith("- ")) / len(lines))
        fr_ell = _r4(
            sum(1 for l in lines if l.endswith("...")) / len(lines))
        keep = (dq.GOPHER_MIN_WORDS <= n_words <= dq.GOPHER_MAX_WORDS
                and 3.0 <= mean_wl <= 10.0 and fr_sym <= 0.1
                and fr_bullet <= 0.9 and fr_ell <= 0.3
                and fr_alpha >= 0.8 and n_stops >= 2)
        g = got[r["doc_id"]]
        assert g["n_words"] == n_words
        assert g["mean_word_len"] == pytest.approx(mean_wl, abs=1e-9)
        assert g["frac_symbol_words"] == pytest.approx(fr_sym, abs=1e-9)
        assert g["frac_bullet_lines"] == pytest.approx(fr_bullet, abs=1e-9)
        assert g["frac_ellipsis_lines"] == pytest.approx(fr_ell, abs=1e-9)
        assert g["frac_alpha_words"] == pytest.approx(fr_alpha, abs=1e-9)
        assert g["n_req_stopwords"] == n_stops
        assert g["keep"] == keep


def _write_docs(spark, tmp_path, rows):
    out = str(tmp_path)
    (spark.createDataFrame(rows, "doc_id long, text string, lang string")
     .write.parquet(out + "/documents.parquet"))
    return out


def test_gopher_individual_rules_reject(spark, tmp_path):
    """Each rule rejects on its own: too few words; no required
    stopwords; symbol-word fraction over 0.1.  doc_id 4 puts the whole
    single line on the plain-period arm (m=4), so the decorations don't
    mask the rule under test."""
    short = "the of and to"  # 4+1 words after the '.' decoration: < 50
    nostop = " ".join(["alpha beta gamma delta"] * 15)
    sym = " ".join(["the of and to have with"] * 9 + ["### ### ### ###"] * 2)
    rows = [(4, short, "en"), (11, nostop, "en"), (18, sym, "en")]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dq.q_gopher_rules(spark, out).collect()}
    assert not got[4]["keep"] and got[4]["n_words"] < dq.GOPHER_MIN_WORDS
    assert not got[11]["keep"] and got[11]["n_req_stopwords"] < 2
    assert not got[18]["keep"] and got[18]["frac_symbol_words"] > 0.1


def test_gopher_clean_doc_keeps(spark, tmp_path):
    """A long stopword-bearing doc on the plain arms passes all rules."""
    text = " ".join(["the cat sat on the mat and the dog ran off"] * 8)
    out = _write_docs(spark, tmp_path, [(4, text, "en")])
    got = dq.q_gopher_rules(spark, out).collect()[0]
    assert got["keep"]


# ---------------------------------------------------------------------------
# C4 line-level cleanup
# ---------------------------------------------------------------------------


def _c4_ok(line: str) -> bool:
    return (line[-1:] in (".", "!", "?") and len(line.split(" ")) >= 3
            and "javascript" not in line and "{" not in line
            and "lorem ipsum" not in line)


def test_c4_matches_pure_python_mirror(spark):
    got = {r["doc_id"]: r for r in dq.q_c4_clean(spark, SF).collect()}
    for r in _docs_rows(spark):
        lines = _page_lines(r["doc_id"], r["text"])
        kept = [l for l in lines if _c4_ok(l)]
        g = got[r["doc_id"]]
        assert g["n_lines"] == len(lines)
        assert g["n_kept_lines"] == len(kept)
        assert g["keep"] == (len(kept) >= dq.C4_MIN_LINES)
        assert g["clean_text"] == "\n".join(kept)


def test_c4_drops_each_boilerplate_arm(spark, tmp_path):
    """With 7+ lines the page cycles through every decoration arm:
    bullet lines (no terminal punct) and javascript/{ lines are
    dropped; plain/note/ellipsis lines survive."""
    text = " ".join(f"tok{i}" for i in range(7 * dq.PAGE_LINE_TOKS))
    out = _write_docs(spark, tmp_path, [(0, text, "en")])
    g = dq.q_c4_clean(spark, out).collect()[0]
    assert g["n_lines"] == 7
    # arms 0 (bullet) and 2 (javascript boilerplate) drop; 1, 3, 4-6 keep
    assert g["n_kept_lines"] == 5
    assert g["keep"]
    for line in g["clean_text"].split("\n"):
        assert _c4_ok(line)


# ---------------------------------------------------------------------------
# Deterministic shard shuffle
# ---------------------------------------------------------------------------


def test_shard_shuffle_layout(spark):
    """Every doc lands in exactly one shard, per-shard positions are a
    contiguous 1..n ranking, and the layout is bit-identical across
    independent runs (crash-recomputable, the q_stratified_sample
    discipline)."""
    a = dq.q_shard_shuffle(spark, SF).collect()
    b = dq.q_shard_shuffle(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    docs = {r["doc_id"] for r in a}
    assert len(docs) == len(a) == 500
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r["shard"] < dq.N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert len(by_shard) == dq.N_SHARDS
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # md5 keying spreads uniformly: no shard is grossly over-loaded
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] <= 3 * sizes[0]


def test_shard_shuffle_decorrelates_crawl_order(spark):
    """Neighboring doc_ids (crawl order) are torn apart: within a
    shard, consecutive positions are rarely consecutive doc_ids."""
    rows = dq.q_shard_shuffle(spark, SF).collect()
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    adjacent = 0
    total = 0
    for prs in by_shard.values():
        prs.sort()
        for (p1, d1), (p2, d2) in zip(prs, prs[1:]):
            total += 1
            if abs(d2 - d1) == 1:
                adjacent += 1
    assert adjacent / total < 0.05


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _two_pass_apply(syms: str, pair: str) -> str:
    """The pinned pure-Python reference for the engine-side two-pass
    anchored replace."""
    merged = pair.replace(" ", "")
    wrapped = " " + syms + " "
    pat, rep = " " + pair + " ", " " + merged + " "
    return wrapped.replace(pat, rep).replace(pat, rep).strip()


@pytest.mark.parametrize("syms,pair,expected", [
    ("h e l l o", "l l", "h e ll o"),
    ("a b a b a b", "a b", "ab ab ab"),
    # odd-length self-pair run: two-pass contract merges [aa, a, aa]
    ("a a a a a", "a a", "aa a aa"),
    ("a a a a", "a a", "aa aa"),
    ("x a b", "a b", "x ab"),
    ("a b", "a b", "ab"),
    ("q", "a b", "q"),
])
def test_two_pass_reference(syms, pair, expected):
    assert _two_pass_apply(syms, pair) == expected


def test_two_passes_always_complete():
    """After two passes no un-merged occurrence of the pair remains —
    the invariant that makes the engine form exactly two replaces."""
    import itertools
    for n in range(1, 9):
        for word in itertools.product("ab", repeat=n):
            syms = " ".join(word)
            out = _two_pass_apply(syms, "a b")
            assert " a b " not in " " + out + " ", (syms, out)


def test_bpe_apply_col_matches_reference(spark):
    """The Spark column expression equals the pure-Python two-pass
    reference on every (syms, pair) edge case, including self-pair
    runs and absent pairs."""
    from pyspark.sql import functions as F

    cases = [
        ("h e l l o", "l l"), ("a a a a a", "a a"), ("a a a a", "a a"),
        ("a b a b a b", "a b"), ("x y z", "a b"), ("a b", "a b"),
        ("q", "a b"), ("t h e t h e", "t h"), ("a a b a a b", "a a"),
    ]
    df = spark.createDataFrame(cases, "syms string, pair string") \
        .select("syms", "pair",
                dq._bpe_apply_col(F.col("syms"), F.col("pair"))
                .alias("out"))
    for r in df.collect():
        assert r["out"] == _two_pass_apply(r["syms"], r["pair"]), \
            (r["syms"], r["pair"])


def test_bpe_pair_count_matches_brute_force(spark):
    """Top pairs equal a from-scratch Python count over the corpus."""
    from collections import Counter

    counts: Counter[str] = Counter()
    vocab: Counter[str] = Counter()
    for r in _docs_rows(spark):
        vocab.update(r["text"].split(" "))
    for word, freq in vocab.items():
        for x, y in zip(word, word[1:]):
            counts[f"{x} {y}"] += freq
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["pair"], r["cnt"])
           for r in dq.q_bpe_pair_count(spark, SF).collect()]
    assert got == expect[:dq.BPE_TOP_PAIRS]


def test_bpe_train_loop(spark):
    """bpe_train: merges are deterministic across runs, each merge is
    the argmax of the pair counts at its step (ties by pair string),
    and replaying the merge list through the pure-Python reference
    reproduces the engine's final vocab exactly."""
    from collections import Counter

    merges, vocab_df = dq.bpe_train(spark, SF, n_merges=6)
    merges2, _ = dq.bpe_train(spark, SF, n_merges=6)
    assert merges == merges2 and len(merges) == 6
    assert len(set(merges)) == len(merges)

    base: Counter[str] = Counter()
    for r in _docs_rows(spark):
        base.update(r["text"].split(" "))
    state = {w: " ".join(w) for w in base}
    for m in merges:
        counts: Counter[str] = Counter()
        for w, syms in state.items():
            s = syms.split(" ")
            for x, y in zip(s, s[1:]):
                counts[f"{x} {y}"] += base[w]
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert m == best[0] and best[1] >= 2
        state = {w: _two_pass_apply(syms, m) for w, syms in state.items()}

    got = {r["word"]: r["syms"] for r in vocab_df.collect()}
    assert got == state


# ---------------------------------------------------------------------------
# Gopher repetition battery
# ---------------------------------------------------------------------------


def _rep_mirror(doc_id: int, text: str) -> dict:
    """Pure-Python Rae et al. A1.1 over the synthesized page (lines) and
    the raw token stream (n-grams), mirroring q_gopher_repetition."""
    from collections import Counter

    lines = _page_lines(doc_id, text)
    total = sum(len(l) for l in lines)
    dist = sum(len(l) for l in set(lines))
    out = {
        "frac_dup_lines": _r4((len(lines) - len(set(lines))) / len(lines)),
        "frac_dup_line_chars": _r4((total - dist) / total),
    }
    toks = text.split(" ")
    n_chars = len(text)
    for n in sorted(set(dq.GOPHER_TOP_NGRAM_MAX) | set(dq.GOPHER_DUP_NGRAM_MAX)):
        c = Counter(" ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1))
        top = max(((cnt, cnt * len(g)) for g, cnt in c.items()),
                  default=(0, 0))
        dup = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
        if n in dq.GOPHER_TOP_NGRAM_MAX:
            out[f"top{n}_char_frac"] = _r4(top[1] / n_chars)
        if n in dq.GOPHER_DUP_NGRAM_MAX:
            out[f"dup{n}_char_frac"] = _r4(dup / n_chars)
    keep = (out["frac_dup_lines"] <= dq.GOPHER_DUP_LINE_MAX
            and out["frac_dup_line_chars"] <= dq.GOPHER_DUP_LINE_CHAR_MAX)
    for n, mx in dq.GOPHER_TOP_NGRAM_MAX.items():
        keep = keep and out[f"top{n}_char_frac"] <= mx
    for n, mx in dq.GOPHER_DUP_NGRAM_MAX.items():
        keep = keep and out[f"dup{n}_char_frac"] <= mx
    out["keep"] = keep
    return out


def test_gopher_repetition_matches_pure_python_mirror(spark):
    """Every fraction and the keep decision match a from-scratch Python
    A1.1 implementation for the full sf0.001 corpus — including the
    struct-max tie-break on the most-frequent-gram char count."""
    got = {r["doc_id"]: r
           for r in dq.q_gopher_repetition(spark, SF).collect()}
    rows = _docs_rows(spark)
    assert len(got) == len(rows)
    for r in rows:
        want = _rep_mirror(r["doc_id"], r["text"])
        g = got[r["doc_id"]]
        for k, v in want.items():
            if k == "keep":
                assert g[k] == v, (r["doc_id"], k)
            else:
                assert g[k] == pytest.approx(v, abs=1e-9), (r["doc_id"], k)


def test_gopher_repetition_drops_looped_page(spark, tmp_path):
    """14 identical 12-token lines: each decoration arm appears twice
    (and the three plain-period arms collapse into one line), so 9 of
    14 page lines are duplicates (0.6429 > 0.30) and the top 2-gram
    blankets the text — both gates independently reject."""
    body = " ".join(["ha"] * dq.PAGE_LINE_TOKS)
    text = " ".join([body] * 14)
    out = _write_docs(spark, tmp_path, [(4, text, "en")])
    g = dq.q_gopher_repetition(spark, out).collect()[0]
    assert g["frac_dup_lines"] == 0.6429 > dq.GOPHER_DUP_LINE_MAX
    assert g["top2_char_frac"] > dq.GOPHER_TOP_NGRAM_MAX[2]
    assert g["dup10_char_frac"] > dq.GOPHER_DUP_NGRAM_MAX[10]
    assert not g["keep"]


def test_gopher_repetition_keeps_varied_doc(spark, tmp_path):
    """A doc of all-distinct tokens has zero duplicate lines and zero
    duplicated n-grams; only the single most-frequent gram (count 1)
    contributes, far under every ceiling."""
    text = " ".join(f"w{i:03d}" for i in range(120))
    out = _write_docs(spark, tmp_path, [(4, text, "en")])
    g = dq.q_gopher_repetition(spark, out).collect()[0]
    assert g["frac_dup_lines"] == 0.0
    assert g["frac_dup_line_chars"] == 0.0
    assert g["dup5_char_frac"] == 0.0 and g["dup10_char_frac"] == 0.0
    assert g["keep"]


def test_gopher_repetition_short_doc_no_grams(spark, tmp_path):
    """A doc shorter than the largest n yields no grams for that n:
    the left join coalesces the missing fractions to 0 instead of
    dropping or nulling the row.  The doc is still rejected — its one
    2-gram covers most of the text, which is exactly how the
    most-frequent-gram ceiling treats near-empty docs."""
    text = "alpha beta gamma"
    out = _write_docs(spark, tmp_path, [(4, text, "en")])
    g = dq.q_gopher_repetition(spark, out).collect()[0]
    assert g["top4_char_frac"] == 0.0   # only 3 tokens: no 4-grams
    assert g["dup5_char_frac"] == 0.0 and g["dup10_char_frac"] == 0.0
    assert g["top2_char_frac"] > dq.GOPHER_TOP_NGRAM_MAX[2]
    assert not g["keep"]


def test_bpe_tokenize_matches_pure_python_replay(spark):
    """q_bpe_tokenize's per-doc subword counts equal tokenizing with a
    pure-Python trainer: derive the exact BPE_TOKENIZE_MERGES merge
    sequence ((cnt DESC, pair ASC) argmax, no early stop), apply it to
    every word, then count subwords per document."""
    from collections import Counter

    rows = _docs_rows(spark)
    base: Counter[str] = Counter()
    for r in rows:
        base.update(r["text"].split(" "))
    state = {w: " ".join(w) for w in base}
    for _ in range(dq.BPE_TOKENIZE_MERGES):
        counts: Counter[str] = Counter()
        for w, syms in state.items():
            s = syms.split(" ")
            for x, y in zip(s, s[1:]):
                counts[f"{x} {y}"] += base[w]
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        state = {w: _two_pass_apply(syms, best) for w, syms in state.items()}

    got = {r["doc_id"]: r
           for r in dq.q_bpe_tokenize(spark, SF).collect()}
    assert len(got) == len(rows)
    for r in rows:
        words = r["text"].split(" ")
        n_sub = sum(len(state[w].split(" ")) for w in words)
        g = got[r["doc_id"]]
        assert g["n_words"] == len(words)
        assert g["n_subwords"] == n_sub
        assert g["subwords_per_word"] == pytest.approx(
            math.floor(n_sub / len(words) * 10000 + 0.5) / 10000,
            abs=1e-9)


# ---------------------------------------------------------------------------
# RefinedWeb URL filter
# ---------------------------------------------------------------------------


def test_url_filter_matches_pure_python_mirror(spark):
    """Domain blocklist + weighted banned-substring score over the
    deterministic synthetic URL, mirrored from scratch in Python for
    the full sf0.001 corpus; the fixture exercises all three outcomes
    (domain-blocked, score-blocked, kept)."""
    rows = spark.read.parquet(SF + "/documents.parquet") \
        .select("doc_id", "source").collect()
    got = {r["doc_id"]: r for r in dq.q_url_filter(spark, SF).collect()}
    assert len(got) == len(rows)
    n_dom, n_score, n_keep = 0, 0, 0
    for r in rows:
        did, src = r["doc_id"], r["source"]
        head = (f"HTTPS://WWW.{src}.Example.COM" if did % 3 == 0
                else f"https://{src}.example.com")
        tail = {0: "?utm_source=feed&id=7", 1: "#section-2", 2: "/",
                3: "?utm_source=a&id=7&utm_campaign=x"}[did % 4]
        raw = f"{head}/articles/{did}{tail}"
        domain = f"{src}.example.com"
        score = _r4(sum(w for word, w in dq.URL_WORD_WEIGHTS
                        if word in raw.lower()))
        blocked = domain in dq.URL_BLOCKED_DOMAINS
        keep = not blocked and score < dq.URL_SCORE_MAX
        g = got[did]
        assert g["domain"] == domain
        assert g["url_score"] == pytest.approx(score, abs=1e-9)
        assert g["domain_blocked"] == blocked
        assert g["keep"] == keep
        n_dom += blocked
        n_score += (not blocked and not keep)
        n_keep += keep
    # every outcome must actually occur, or the mirror proves nothing
    assert n_dom and n_score and n_keep


def test_rule_funnel_monotone_and_consistent(spark):
    """Stage doc/token counts are monotone non-increasing through the
    cumulative gauntlet (the 5_c4 token count may only shrink further:
    it counts CLEANED text), 1_raw equals the corpus, and each stage's
    doc count equals independently AND-ing the per-operator keep
    columns."""
    rows = {r["stage"]: r for r in dq.q_rule_funnel(spark, SF).collect()}
    assert set(rows) == {"1_raw", "2_url", "3_gopher", "4_repetition",
                         "5_c4"}
    order = ["1_raw", "2_url", "3_gopher", "4_repetition", "5_c4"]
    for a, b in zip(order, order[1:]):
        assert rows[a]["n_docs"] >= rows[b]["n_docs"]
        assert rows[a]["n_tokens"] >= rows[b]["n_tokens"]
    docs = _docs_rows(spark)
    assert rows["1_raw"]["n_docs"] == len(docs)
    assert rows["1_raw"]["n_tokens"] == sum(
        len(r["text"].split(" ")) for r in docs)

    url = {r["doc_id"]: r["keep"]
           for r in dq.q_url_filter(spark, SF).collect()}
    gop = {r["doc_id"]: r["keep"]
           for r in dq.q_gopher_rules(spark, SF).collect()}
    rep = {r["doc_id"]: r["keep"]
           for r in dq.q_gopher_repetition(spark, SF).collect()}
    c4 = {r["doc_id"]: r["keep"]
          for r in dq.q_c4_clean(spark, SF).collect()}
    ids = list(url)
    assert rows["2_url"]["n_docs"] == sum(url[i] for i in ids)
    assert rows["3_gopher"]["n_docs"] == sum(
        url[i] and gop[i] for i in ids)
    assert rows["4_repetition"]["n_docs"] == sum(
        url[i] and gop[i] and rep[i] for i in ids)
    assert rows["5_c4"]["n_docs"] == sum(
        url[i] and gop[i] and rep[i] and c4[i] for i in ids)

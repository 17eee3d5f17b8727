"""Seeded differential fuzzing: webtext operators vs pure-Python
oracles (round 6, VERDICT item 10).

Same conventions as test_random_differential.py's Spark side: a
SEEDED deterministic population, ONE createDataFrame per operator run
(no per-example Spark jobs, no flaky examples). The Python oracles
reimplement each operator's contract from its docstring — any
disagreement is a real semantics bug in one of the two.

The generators deliberately wander into the corners the round-5/6
fixes live in: regex-special separators, lines that are empty or all
boilerplate, rates 0.0/1.0, md5-threshold boundaries, multi-label PSL
suffixes, userinfo/ports/trailing dots in URLs, and ties in the
per-key cap ordering.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from jschon_spark.operators import webtext
from jschon_spark.operators._psl import PSL_2LABEL, PSL_3LABEL

# ---- corpus generator --------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "word", "the", "and", "x"]
_SHARED_LINES = [
    "subscribe to our newsletter today.",
    "all rights reserved",
    "click here now",
    'she said "stop"',
    "",
]


def _rand_line(rng: random.Random) -> str:
    n = rng.randrange(0, 9)
    line = " ".join(rng.choice(_WORDS) for _ in range(n))
    tail = rng.choice(["", ".", "!", "?", '"', " javascript required", " {"])
    return line + tail


def _corpus(rng: random.Random, n_docs: int, sep: str) -> list[tuple]:
    rows = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.randrange(1, 6)):
            if rng.random() < 0.45:
                lines.append(rng.choice(_SHARED_LINES))
            else:
                lines.append(_rand_line(rng))
        if rng.random() < 0.1:
            lines.append("lorem ipsum dolor")
        rows.append((i, sep.join(lines),
                     rng.choice(["en", "de", "fr", "xx"]),
                     f"src{rng.randrange(6)}",
                     rng.randrange(0, 50)))
    return rows


# ---- pure-Python oracles ----------------------------------------------

def _py_line_dedup(rows, min_docs, sep):
    from collections import defaultdict
    docs_per_line = defaultdict(set)
    for i, text, *_ in rows:
        for line in text.split(sep):
            docs_per_line[line].add(i)
    frequent = {l for l, d in docs_per_line.items() if len(d) >= min_docs}
    out = {}
    for i, text, *_ in rows:
        lines = text.split(sep)
        kept = [l for l in lines if l not in frequent]
        out[i] = (len(lines), len(kept), sep.join(kept))
    return out


def _py_c4(rows, min_words, min_kept, sep):
    out = {}
    for i, text, *_ in rows:
        lines = text.split(sep)
        kept = [
            l for l in lines
            if re.search(r'[.!?"]$', l)
            and len(l.split(" ")) >= min_words
            and "javascript" not in l.lower()
        ]
        has_lorem = "lorem ipsum" in text.lower()
        has_brace = "{" in text
        out[i] = (
            len(lines), len(kept), has_lorem, has_brace,
            not has_lorem and not has_brace and len(kept) >= min_kept,
            sep.join(kept),
        )
    return out


def _py_keep(doc_id, rate) -> bool:
    v = int(rate * 16 ** 8)
    if v >= 16 ** 8:
        return True
    if v <= 0:
        return False
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    return h < format(v, "08x")


def _py_pack(rows, budget):
    out = {}
    by_lang: dict[str, list] = {}
    for i, text, lang, *_ in rows:
        by_lang.setdefault(lang, []).append((i, len(text.split(" "))))
    for lang, docs in by_lang.items():
        cum = 0
        for i, n in sorted(docs):
            k = (lang, cum // budget)
            d, s = out.get(k, (0, 0))
            out[k] = (d + 1, s + n)
            cum += n
    return out


def _py_url(u: str):
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", u)
    hostraw = m.group(1) if m else ""
    host_l = re.sub(r"^[^@]*@", "", hostraw).lower()
    m = re.search(r":([0-9]+)$", host_l)
    port = m.group(1) if m else ""
    host = re.sub(r"\.$", "", re.sub(r":[0-9]+$", "", host_l))
    domain_base = re.sub(r"^www\.", "", host)
    labels = domain_base.split(".")
    n = len(labels)
    if n >= 4 and ".".join(labels[-3:]) in PSL_3LABEL:
        domain = ".".join(labels[-4:])
    elif n >= 3 and ".".join(labels[-2:]) in PSL_2LABEL:
        domain = ".".join(labels[-3:])
    elif n >= 2:
        domain = ".".join(labels[-2:])
    else:
        domain = domain_base
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = m.group(1) if m else ""
    m = re.search(r"\?([^#]*)", u)
    query = m.group(1) if m else ""
    keep_port = (port != "" and not (scheme == "http" and port == "80")
                 and not (scheme == "https" and port == "443"))
    parse_ok = scheme != "" and host != ""
    canon = (scheme + "://" + host
             + (":" + port if keep_port else "")
             + (path if path != "" else "/")
             + ("?" + query if query != "" else ""))
    if not parse_ok:
        return (scheme, None, None, None, False)
    return (scheme, host, domain, canon, True)


# ---- differential tests ------------------------------------------------

@pytest.mark.parametrize("seed,sep", [(1, "\n"), (2, "."), (3, "|")])
def test_line_dedup_differential(spark, seed, sep):
    rng = random.Random(seed)
    rows = _corpus(rng, 250, sep)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    min_docs = rng.randrange(2, 40)
    exp = _py_line_dedup(rows, min_docs, sep)
    got = {r.doc_id: (r.n_lines, r.n_kept, r.text_dedup) for r in
           webtext.line_dedup(df, min_docs=min_docs, sep=sep).collect()}
    assert got == exp, (seed, sep, min_docs)


@pytest.mark.parametrize("seed,sep,min_words", [(4, "\n", 5), (5, "|", 2)])
def test_c4_clean_differential(spark, seed, sep, min_words):
    rng = random.Random(seed)
    rows = _corpus(rng, 250, sep)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    exp = _py_c4(rows, min_words, 1, sep)
    got = {r.doc_id: (r.n_lines, r.n_kept_lines, r.has_lorem, r.has_brace,
                      r.c4_passed, r.text_clean) for r in
           webtext.c4_clean(df, min_words=min_words, sep=sep).collect()}
    assert got == exp, (seed, sep)


def test_stratified_sample_differential(spark):
    rng = random.Random(6)
    rows = _corpus(rng, 300, "\n")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    rates = {"en": 1.0, "de": 0.37, "fr": 0.0}
    default = 0.2
    exp = {i for i, _, lang, *_ in rows
           if _py_keep(i, rates.get(lang, default))}
    got = {r.doc_id for r in
           webtext.stratified_sample(df, rates=rates,
                                     default_rate=default).collect()}
    assert got == exp
    assert {i for i, _, l, *_ in rows if l == "en"} <= got      # 1.0 = ALL
    assert not ({i for i, _, l, *_ in rows if l == "fr"} & got)  # 0.0 = none


def test_per_key_cap_differential(spark):
    rng = random.Random(7)
    rows = _corpus(rng, 300, "\n")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    k = 4
    by_key: dict[str, list] = {}
    for i, _t, _l, src, nch in rows:
        by_key.setdefault(src, []).append((-nch, i))
    exp = {}
    for src, docs in by_key.items():
        for rank, (_negn, i) in enumerate(sorted(docs)[:k], start=1):
            exp[i] = rank
    got = {r.doc_id: r.rank for r in
           webtext.per_key_cap(df, "source", "n_chars", k=k).collect()}
    assert got == exp


@pytest.mark.parametrize("seed,budget,n_buckets", [(8, 16, 5), (9, 64, 4096)])
def test_pack_token_bins_differential(spark, seed, budget, n_buckets):
    rng = random.Random(seed)
    rows = _corpus(rng, 300, "\n")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    exp = _py_pack(rows, budget)
    got = {(r.lang, r.bin): (r.n_docs, r.total_tokens) for r in
           webtext.pack_token_bins(df, budget=budget,
                                   n_buckets=n_buckets).collect()}
    assert got == exp, (seed, budget, n_buckets)


def test_url_features_differential(spark):
    rng = random.Random(10)
    suffixes = (["example.org", "example.com", "localhost", "co.uk",
                 "bbc.co.uk", "github.io", "s3.amazonaws.com",
                 "blogspot.co.uk", "example.com.au"])
    urls = []
    for i in range(400):
        if rng.random() < 0.1:
            urls.append((i, rng.choice(["", "not a url", "http//x", ":80",
                                        "https:///nohost"])))
            continue
        scheme = rng.choice(["http", "https", "HtTpS", "ftp"])
        user = rng.choice(["", "u@", "u:p@"])
        labels = ["www.", "sub.", "a.b.", ""][rng.randrange(4)]
        host = labels + rng.choice(suffixes) + rng.choice(["", "."])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/x/y"])
        q = rng.choice(["", "?a=1&b=2"])
        frag = rng.choice(["", "#frag"])
        urls.append((i, f"{scheme}://{user}{host}{port}{path}{q}{frag}"))
    df = spark.createDataFrame(urls, "doc_id long, url string")
    exp = {i: _py_url(u) for i, u in urls}
    got = {r.doc_id: (r.scheme, r.host, r.domain, r.url_canon, r.parse_ok)
           for r in webtext.url_features(df).collect()}
    assert got == exp


def test_domain_blocklist_differential(spark):
    """Blocklist verdicts vs the pure-Python url oracle: the hit rule
    is domain-IN or host-IN or dotted-suffix-of-host, never firing on
    unparseable urls."""
    rng = random.Random(21)
    suffixes = ["example.org", "bbc.co.uk", "github.io", "evil.example.org",
                "s3.amazonaws.com", "localhost", "example.com.au"]
    urls = []
    for i in range(300):
        if rng.random() < 0.12:
            urls.append((i, rng.choice(["", "junk", "http//x"])))
            continue
        labels = ["www.", "sub.", "a.b.", ""][rng.randrange(4)]
        urls.append((i, f"https://{labels}{rng.choice(suffixes)}/p{i}"))
    blocked = ["bbc.co.uk", "evil.example.org", "bucket.s3.amazonaws.com"]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {r.doc_id: r.blocked for r in
           webtext.domain_blocklist_filter(
               df, blocked=blocked, keep_blocked=True).collect()}
    bl = set(blocked)
    exp = {}
    for i, u in urls:
        scheme, host, domain, _canon, ok = _py_url(u)
        hit = bool(ok) and (
            domain in bl or host in bl
            or any(host.endswith("." + b) for b in bl)
        )
        exp[i] = hit
    assert got == exp

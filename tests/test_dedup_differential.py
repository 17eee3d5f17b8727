"""Seeded differential fuzzing: corpus-dedup operators vs pure-Python
oracles (round 6 — extends the webtext differential family to
dedup.ngram_span_duplicates and similarity.semantic_dedup).

Same conventions as test_webtext_differential.py: a SEEDED
deterministic population, ONE createDataFrame per operator run. The
Python oracles reimplement the documented contract independently
(union-find instead of pointer doubling, dict counting instead of
window aggregation) — any disagreement is a real semantics bug.

Generators steer into the corners: docs shorter than the gram window,
NULL/empty/whitespace-only texts, within-doc-only gram repeats,
identical docs (every gram duplicated), exact-duplicate vectors
(centroid-cosine ties -> id tie-break), opposite-direction vectors
(never the same cluster), and min_docs thresholds that just
include/exclude a gram. ASCII whitespace only: Java's \\s is
ASCII-bound while Python's is unicode-wide, a documented tokenizer
boundary, not a target of this fuzz.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from jschon_spark.operators import dedup, similarity


# ---- pure-Python replicas of the documented contracts -------------------

def _py_tokens(text: str | None) -> list[str]:
    if text is None:
        text = ""
    norm = re.sub(r"\s+", " ", text.strip().lower())
    return [t for t in re.split(r"\s+", norm) if t != ""]


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_ngram_span(rows, window, min_docs):
    grams = {}
    for doc_id, text in rows:
        toks = _py_tokens(text)
        grams[doc_id] = [
            _py_hash60(" ".join(toks[i:i + window]))
            for i in range(len(toks) - window + 1)
        ]
    docs_per_hash: dict[int, set] = {}
    for doc_id, gh in grams.items():
        for h in set(gh):
            docs_per_hash.setdefault(h, set()).add(doc_id)
    out = {}
    for doc_id, gh in grams.items():
        n_dup = sum(1 for h in gh if len(docs_per_hash[h]) >= min_docs)
        out[doc_id] = (
            len(gh), n_dup, (n_dup / len(gh)) if gh else 0.0
        )
    return out


def _py_semantic_dedup(rows, dim, threshold, n_lists, seed, cap):
    cents = similarity.seeded_centroids(dim, n_lists, seed)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    def cos(a, b):
        d = (dot(a, a) ** 0.5) * (dot(b, b) ** 0.5)
        return dot(a, b) / d if d > 0 else None

    assign, ccos = {}, {}
    for vid, v in rows:
        cs = [cos(v, c) for c in cents]
        best = max(c for c in cs if c is not None)
        li = cs.index(best)
        assign[vid], ccos[vid] = li, cs[li]
    # per-cluster participation cap in id order
    part = set()
    for li in set(assign.values()):
        members = sorted(v for v, l in assign.items() if l == li)
        part.update(members[:cap])
    # union-find over intra-cluster pairs above threshold
    parent = {v: v for v, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    vecs = dict(rows)
    in_group = set()
    ids = sorted(part)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if assign[a] != assign[b]:
                continue
            c = cos(vecs[a], vecs[b])
            if c is not None and c >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                in_group.update((a, b))
    out = {}
    groups: dict[int, list] = {}
    for v in in_group:
        groups.setdefault(find(v), []).append(v)
    keeper = {
        g: min(ms, key=lambda m: (ccos[m], m)) for g, ms in groups.items()
    }
    for vid, _ in rows:
        if vid in in_group:
            g = find(vid)
            out[vid] = (assign[vid], g, vid == keeper[g])
        else:
            out[vid] = (assign[vid], None, True)
    return out


# ---- generators ----------------------------------------------------------

_WORDS = ["a", "b", "c", "dd", "eee", "the", "of", "zz"]


def _gram_corpus(rng: random.Random, n_docs: int) -> list[tuple]:
    planted = [" ".join(rng.choice(_WORDS) for _ in range(7)) for _ in range(4)]
    rows = []
    for i in range(n_docs):
        roll = rng.random()
        if roll < 0.08:
            rows.append((i, rng.choice([None, "", "   ", "\t\n "])))
        elif roll < 0.2:
            # shorter than the window
            rows.append((i, " ".join(rng.choice(_WORDS)
                                     for _ in range(rng.randrange(1, 4)))))
        elif roll < 0.4:
            # a planted shared span embedded in noise
            pre = " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(0, 4)))
            rows.append((i, (pre + " " + rng.choice(planted)).strip()))
        elif roll < 0.5:
            # within-doc-only repeat: the same 5-gram twice, unique salt
            span = " ".join(rng.choice(_WORDS) for _ in range(5))
            rows.append((i, f"{span} u{i} {span}"))
        else:
            rows.append((i, " ".join(rng.choice(_WORDS)
                                     for _ in range(rng.randrange(5, 15)))))
    # a pair of identical docs
    rows.append((n_docs, "q r s t u v w"))
    rows.append((n_docs + 1, "q r s t u v w"))
    return rows


@pytest.mark.parametrize("seed,window,min_docs", [(11, 5, 2), (12, 3, 3), (13, 4, 2)])
def test_ngram_span_differential(spark, seed, window, min_docs):
    rng = random.Random(seed)
    rows = _gram_corpus(rng, 200)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp = _py_ngram_span(rows, window, min_docs)
    got = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_fraction) for r in
           dedup.ngram_span_duplicates(df, window=window,
                                       min_docs=min_docs).collect()}
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][:2] == exp[d][:2], (seed, d, got[d], exp[d])
        assert abs(got[d][2] - exp[d][2]) < 1e-12, (seed, d)


def _vec_corpus(rng: random.Random, n: int, dim: int) -> list[tuple]:
    rows = []
    i = 0
    while i < n:
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, v))
        i += 1
        roll = rng.random()
        if roll < 0.2 and i < n:
            rows.append((i, list(v)))           # exact duplicate (ccos tie)
            i += 1
        elif roll < 0.35 and i < n:
            rows.append((i, [x * rng.choice([2.0, 0.5]) for x in v]))  # scaled
            i += 1
        elif roll < 0.45 and i < n:
            rows.append((i, [-x for x in v]))   # opposite direction
            i += 1
        elif roll < 0.55 and i < n:
            w = [x + rng.uniform(-0.05, 0.05) for x in v]  # near-dup
            rows.append((i, w))
            i += 1
    return rows


@pytest.mark.parametrize("seed,threshold,n_lists,cap",
                         [(21, 0.9, 8, 10_000), (22, 0.99, 4, 10_000),
                          (23, 0.8, 8, 5)])
def test_semantic_dedup_differential(spark, seed, threshold, n_lists, cap):
    rng = random.Random(seed)
    dim = 16
    rows = _vec_corpus(rng, 150, dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exp = _py_semantic_dedup(rows, dim, threshold, n_lists, 7, cap)
    got = {r.vec_id: (r.list_id, r.group_id, r.keep) for r in
           similarity.semantic_dedup(df, dim=dim, threshold=threshold,
                                     n_lists=n_lists, seed=7,
                                     max_cluster_size=cap).collect()}
    assert got == exp, (seed, {k: (got[k], exp[k])
                               for k in got if got[k] != exp[k]})


def _py_incremental(new_rows, hist_rows):
    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower()) if t is not None else None

    hist = {hashlib.md5(norm(t).encode()).hexdigest()
            for _, t in hist_rows if t is not None}
    return {i: (norm(t) is not None
                and hashlib.md5(norm(t).encode()).hexdigest() in hist)
            for i, t in new_rows}


@pytest.mark.parametrize("seed", [31, 32])
def test_incremental_dedup_differential(spark, seed):
    rng = random.Random(seed)
    hist_rows = [(i, " ".join(rng.choice(_WORDS)
                              for _ in range(rng.randrange(3, 10))))
                 for i in range(150)]
    new_rows = []
    for i in range(150):
        roll = rng.random()
        if roll < 0.3:
            # re-ingested history doc, possibly re-whitespaced/cased
            _, t = rng.choice(hist_rows)
            t = t.upper() if rng.random() < 0.5 else ("  " + t.replace(" ", "\t"))
            new_rows.append((1000 + i, t))
        elif roll < 0.38:
            new_rows.append((1000 + i, rng.choice([None, "", "   "])))
        else:
            new_rows.append((1000 + i, " ".join(
                rng.choice(_WORDS) for _ in range(rng.randrange(3, 10))) + f" u{i}"))
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    exp = _py_incremental(new_rows, hist_rows)
    got = {r.doc_id: r.is_exact_dup for r in
           dedup.dedup_against_corpus(new, hist).collect()}
    assert got == exp, (seed, {k: (got[k], exp[k])
                               for k in got if got[k] != exp[k]})


def test_nfc_differential(spark):
    import hashlib as _h
    import unicodedata

    rng = random.Random(41)
    pool = ["café", "café", "Å", "Å", "Å",  # NFD/NFC/angstrom
            "plain", "", "ẍý", "Ａ　x", "ȩ́"]
    rows = [(i, rng.choice(pool) + rng.choice(["", " tail", "́"]))
            for i in range(120)] + [(999, None)]
    from jschon_spark.operators import textqa
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.nfc_md5, r.n_chars_nfc, r.nfc_changed) for r in
           textqa.nfc_features(df).collect()}
    for i, t in rows:
        if t is None:
            assert got[i] == (None, None, None)
            continue
        n = unicodedata.normalize("NFC", t)
        assert got[i] == (_h.md5(n.encode()).hexdigest(), len(n), n != t), (i, t)

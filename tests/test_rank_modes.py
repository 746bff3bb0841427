"""plans/rank.py — LM-Dirichlet ranking, term vectors, two-phase
rescore: each checked against an independent pure-Python recomputation
(wildcard expansion/top-k live in test_index_wand.py, which owns the
compressed-index fixture).

Float-parity note: the LM and rescore tests use TWO-term queries on
purpose — IEEE addition is commutative, so a two-addend per-doc sum is
order-independent.  BM25 first-pass scores compare EXACTLY (idf is a
driver-side Python math.log literal; everything JVM-side is +,*,/ which
are correctly rounded).  Quantities where the JVM computes a log
(LM addends, the rescore boost) compare at ~1-ulp tolerance: JVM
Math.log and libm log are each allowed 1 ulp and may disagree — the
same reason every cross-engine driver twin rounds doubles to 6."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from ir_index_construction_spark.operators.phrase import token_positions
from ir_index_construction_spark.plans.rank import (
    lm_dirichlet_topk,
    rescore_topk,
    term_vector,
)
from ir_index_construction_spark.text.normalize import parse_query

MU = 2000.0
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def vocab(built):
    return {r["term"]: (int(r["df"]), int(r["cf"]))
            for r in built.dictionary.collect()}


@pytest.fixture(scope="module")
def total_tokens(vocab):
    return float(sum(cf for _, cf in vocab.values()))


def _lm_expected(built, vocab, total_tokens, query, k=10, mu=MU):
    terms, is_bool = parse_query(query)
    counts = Counter(terms)
    present = [t for t in counts if t in vocab]
    if not terms or not present or (is_bool and len(present) < len(counts)):
        return []
    rows = [r for r in built.postings.collect() if r["term"] in present]
    score = defaultdict(float)
    nt = defaultdict(int)
    for r in rows:
        p_c = vocab[r["term"]][1] / total_tokens
        add = counts[r["term"]] * (
            math.log(1.0 + r["tf"] / (mu * p_c))
            + math.log(mu / (r["dl"] + mu)))
        score[r["doc_id"]] += add
        nt[r["doc_id"]] += 1
    docs = [d for d in score if not is_bool or nt[d] == len(present)]
    docs.sort(key=lambda d: (-score[d], d))
    return [(d, score[d]) for d in docs[:k]]


@pytest.mark.parametrize("query", [
    "machine learning",
    "machine AND learning",
    "commoncrawl",
    "machine AND zzzymissing",
    "",
])
def test_lm_dirichlet_matches_pure_python(built, vocab, total_tokens, query):
    got = lm_dirichlet_topk(
        built.postings, built.dictionary, built.docs, query,
        built.n_docs, total_tokens, k=10, mu=MU).collect()
    want = _lm_expected(built, vocab, total_tokens, query, k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
    for r, (_, s) in zip(got, want):
        # JVM Math.log and libm log may differ in the last ulp (neither
        # is correctly rounded), so cross-runtime parity is ~1e-15
        # relative, not bit-exact — same reason the driver twins
        # round(_, 6)
        assert math.isclose(r["score"], s, rel_tol=1e-12, abs_tol=1e-12)


def test_lm_cf_cache_skips_lookup_and_matches(built, total_tokens):
    cache: dict = {}
    a = lm_dirichlet_topk(built.postings, built.dictionary, built.docs,
                          "machine learning", built.n_docs, total_tokens,
                          cf_cache=cache).collect()
    assert cache, "cf cache populated"
    pre = dict(cache)
    b = lm_dirichlet_topk(built.postings, built.dictionary, built.docs,
                          "machine learning", built.n_docs, total_tokens,
                          cf_cache=cache).collect()
    assert cache == pre
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


# ---------------------------------------------------------------------------
# term vectors
# ---------------------------------------------------------------------------


def test_term_vector_matches_manual(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog the fox"),
        (1, "hash join beats sort merge join when the build side fits"),
        (2, ""),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    pos = token_positions(docs)
    for doc_id, text in texts:
        got = {r["term"]: (r["tf"], list(r["positions"]))
               for r in term_vector(pos, doc_id).collect()}
        want: dict = {}
        for i, t in enumerate(text.split()):
            want.setdefault(t, [0, []])
            want[t][0] += 1
            want[t][1].append(i)
        assert got == {t: (tf, ps) for t, (tf, ps) in want.items()}


# ---------------------------------------------------------------------------
# two-phase rescore
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mini_corpus(spark):
    """~40 docs over a tiny vocabulary; some contain the exact phrase
    'hash join', others both terms scattered — so the rescorer has real
    work to do and provably reorders the first pass."""
    rng = random.Random(42)
    words = ["scan", "filter", "sort", "merge", "index", "batch"]
    rows = []
    for i in range(40):
        toks = [rng.choice(words) for _ in range(rng.randint(8, 30))]
        if i % 3 == 0:
            p = rng.randrange(len(toks))
            toks[p:p] = ["hash", "join"]              # one adjacent pair
        elif i % 3 == 1:
            # high tf but scattered (separated by filler) — wins the
            # first pass, loses to the phrase boost in the rescore
            for _ in range(3):
                toks.extend(["hash", rng.choice(words), "join",
                             rng.choice(words)])
        rows.append((i, f"http://d{i}.test/", " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    pos = token_positions(docs)
    toks = pos.select("doc_id", "term")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    postings = (toks.groupBy("term", "doc_id")
                .agg(F.count("*").alias("tf")).join(dl, "doc_id"))
    dictionary = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf"))
    n_docs = docs.count()
    avgdl = toks.count() / n_docs
    return dict(docs=docs, pos=pos, postings=postings,
                dictionary=dictionary, n_docs=n_docs, avgdl=avgdl,
                raw=rows)


def _rescore_expected(raw, n_docs, avgdl, terms, first_n, k, weight):
    toks = {d: t.split() for d, _, t in raw}
    df = Counter()
    for d, seq in toks.items():
        for t in set(seq):
            df[t] += 1
    score = {}
    for d, seq in toks.items():
        c = Counter(seq)
        s, hit = 0.0, 0
        for t in terms:
            if c[t] == 0:
                continue
            hit += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            w = (c[t] * (K1 + 1.0)) / (
                c[t] + K1 * (1.0 - B + B * (len(seq) / avgdl)))
            s += idf * w
        if hit:
            score[d] = s
    first = sorted(score, key=lambda d: (-score[d], d))[:first_n]
    out = []
    for d in first:
        seq = toks[d]
        ptf = sum(1 for a, b in zip(seq, seq[1:])
                  if (a, b) == (terms[0], terms[1]))
        out.append((d, ptf, score[d],
                    score[d] + weight * math.log(1.0 + ptf)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:k]


def test_rescore_topk_matches_manual_and_reorders(mini_corpus):
    mc = mini_corpus
    terms = ["hash", "join"]
    got = rescore_topk(
        mc["pos"], mc["postings"], mc["dictionary"], mc["docs"],
        "", mc["n_docs"], mc["avgdl"], first_n=20, k=10, weight=3.0,
        pre_parsed=(terms, False)).collect()
    want = _rescore_expected(mc["raw"], mc["n_docs"], mc["avgdl"],
                             terms, first_n=20, k=10, weight=3.0)
    assert [(r["doc_id"], r["ptf"]) for r in got] == \
           [(d, p) for d, p, _, _ in want]
    for r, (_, _, sf, s) in zip(got, want):
        assert r["score_first"] == sf      # 2-term sum, python idf: exact
        assert math.isclose(r["score"], s, rel_tol=1e-12, abs_tol=1e-12)
    # the boost actually reordered the page vs the first pass
    first_order = [d for d, _, sf, _ in
                   sorted(want, key=lambda x: (-x[2], x[0]))]
    assert [r["doc_id"] for r in got] != first_order[:10]
    # docs without the adjacent pair keep their first-pass score
    for r in got:
        if r["ptf"] == 0:
            assert r["score"] == r["score_first"]


def test_rescore_single_term_is_plain_topk(mini_corpus):
    mc = mini_corpus
    got = rescore_topk(
        mc["pos"], mc["postings"], mc["dictionary"], mc["docs"],
        "", mc["n_docs"], mc["avgdl"], first_n=20, k=5,
        pre_parsed=(["hash"], False)).collect()
    assert all(r["ptf"] == 0 for r in got)
    assert all(r["score"] == r["score_first"] for r in got)
    assert len(got) == 5


def test_rescore_absent_terms_empty(mini_corpus):
    mc = mini_corpus
    got = rescore_topk(
        mc["pos"], mc["postings"], mc["dictionary"], mc["docs"],
        "", mc["n_docs"], mc["avgdl"],
        pre_parsed=(["zzzymissing"], False)).collect()
    assert got == []

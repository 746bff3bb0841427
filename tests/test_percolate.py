"""Percolator (reverse search): registry parsing, AND/OR matching
against the engine's own postings relation, edge cases, and the
streaming-alerting composition (percolate inside foreachBatch)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from ir_index_construction_spark.operators.percolate import (
    percolate, register_queries)
from ir_index_construction_spark.text.normalize import parse_query

REGISTRY = {
    "a_or": "machine learning",
    "b_and": "machine AND learning",
    "c_and_absent": "machine AND zzzymissing",
    "d_or_partial": "software zzzymissing",
    "e_dup": "learning machine learning",   # repeated word = one requirement
}


def _doc_termsets(built):
    sets: dict = defaultdict(set)
    for r in built.postings.select("doc_id", "term").collect():
        sets[r["doc_id"]].add(r["term"])
    return sets


def _expected(built):
    sets = _doc_termsets(built)
    want = set()
    for qid, qtext in REGISTRY.items():
        terms, is_bool = parse_query(qtext)
        uniq = set(terms)
        for doc_id, have in sets.items():
            hit = have & uniq
            if not hit:
                continue
            if is_bool and hit != uniq:
                continue
            want.add((qid, doc_id, len(hit)))
    return want


def test_percolate_matches_bruteforce(built, spark):
    registry = register_queries(spark, REGISTRY)
    got = {(r["query_id"], r["doc_id"], r["n_matched"])
           for r in percolate(built.postings, registry).collect()}
    want = _expected(built)
    assert got == want
    qids = {q for q, _, _ in got}
    assert "a_or" in qids and "b_and" in qids      # both modes fire
    assert "c_and_absent" not in qids              # AND w/ absent term: never
    assert "d_or_partial" in qids                  # OR fires on the present term
    # AND matches are exactly the OR matches with a full term set
    a = {(d, n) for q, d, n in got if q == "a_or"}
    b = {(d, n) for q, d, n in got if q == "b_and"}
    assert b == {(d, n) for d, n in a if n == 2}
    # duplicate words collapse to one requirement: e_dup == a_or
    e = {(d, n) for q, d, n in got if q == "e_dup"}
    assert e == a


def test_percolate_empty_and_degenerate(built, spark):
    # empty registry -> empty result, same schema
    empty = register_queries(spark, {})
    out = percolate(built.postings, empty)
    assert out.columns == ["query_id", "doc_id", "n_matched"]
    assert out.count() == 0
    # a query that normalizes to nothing registers no terms
    blank = register_queries(spark, {"q": "!!! ???"})
    assert blank.count() == 0
    assert percolate(built.postings, blank).count() == 0


def test_percolate_streaming_alerting(built, spark, tmp_path):
    """The alerting deployment: each micro-batch of docs percolates
    against the broadcast registry inside foreachBatch; the union of
    per-batch alerts equals the batch percolation of the same docs."""
    registry = register_queries(spark, REGISTRY)
    terms = built.postings.select("doc_id", "term")
    # split the corpus into two "micro-batches" deterministically
    batches = [terms.filter((terms.doc_id % 2) == i) for i in (0, 1)]
    streamed = set()
    for b in batches:        # what foreachBatch(lambda df, _: ...) runs
        streamed |= {(r["query_id"], r["doc_id"], r["n_matched"])
                     for r in percolate(b, registry).collect()}
    whole = {(r["query_id"], r["doc_id"], r["n_matched"])
             for r in percolate(terms, registry).collect()}
    assert streamed == whole


def test_percolate_punctuated_registry_unstemmed(spark):
    """Round-4 ADVICE: the unstemmed tier must normalize a standing
    query's punctuation with the SAME rule as the document tokenizer
    (non-alnum -> space), so 'data-stream' registers ('data','stream')
    — not the never-indexed token 'datastream'."""
    reg = register_queries(
        spark, {"p": "data-stream", "q": "a.b AND c/d"}, stem=False)
    rows = {(r["query_id"], r["term"], r["n_terms"], r["is_bool"])
            for r in reg.collect()}
    assert rows == {
        ("p", "data", 2, False), ("p", "stream", 2, False),
        ("q", "a", 4, True), ("q", "b", 4, True),
        ("q", "c", 4, True), ("q", "d", 4, True),
    }
    docs = spark.createDataFrame(
        [(1, "data"), (1, "stream"), (2, "datastream"),
         (3, "a"), (3, "b"), (3, "c"), (3, "d"), (4, "a")],
        "doc_id long, term string")
    got = {(r["query_id"], r["doc_id"], r["n_matched"])
           for r in percolate(docs, reg).collect()}
    # the punctuated OR query fires on its split tokens, never on the
    # concatenation; the punctuated AND needs all four split tokens
    assert got == {("p", 1, 2), ("q", 3, 4)}


def test_percolate_hot_key_registry(built, spark):
    """Skew pin: ONE term shared by every standing query (the broadcast
    join's hot key).  Every (query, doc) pair must still appear exactly
    once with the right n_matched — the hash agg on (query_id, doc_id)
    dedups the fanned-out hot-term rows, and an OR query sharing only
    the hot term matches exactly the hot term's doc set."""
    hot = "machin"                       # stemmed 'machine' — high df
    reg_q = {f"hot{i:02d}": f"machine uniqword{i}" for i in range(25)}
    registry = register_queries(spark, reg_q)
    got = percolate(built.postings, registry)
    rows = got.collect()
    assert len(rows) == len({(r["query_id"], r["doc_id"]) for r in rows})
    hot_docs = {r["doc_id"] for r in built.postings
                .filter(built.postings.term == hot)
                .select("doc_id").distinct().collect()}
    per_q = defaultdict(set)
    for r in rows:
        per_q[r["query_id"]].add(r["doc_id"])
        assert r["n_matched"] == 1       # uniqwords never occur in corpus
    assert set(per_q) == set(reg_q)      # all 25 queries fire
    for q, ds in per_q.items():
        assert ds == hot_docs

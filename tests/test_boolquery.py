"""Nested boolean query expressions (plans/boolquery.py): parser AST
shapes and precedence, engine results vs a pure-Python evaluator over
the same built tables, and equivalence with the flat boolean path."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from ir_index_construction_spark.plans.boolquery import (
    bool_query_topk,
    expr_terms,
    parse_bool_expr,
)

K1, B = 1.2, 0.75


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_ast_shapes():
    # stems: machine->machin, learning->learn, software->softwar
    assert parse_bool_expr("(machine OR learning) AND NOT software") == (
        "and", [("or", [("term", "machin"), ("term", "learn")]),
                ("not", ("term", "softwar"))])
    # precedence: AND binds tighter than OR
    assert parse_bool_expr("machine OR learning AND software") == (
        "or", [("term", "machin"),
               ("and", [("term", "learn"), ("term", "softwar")])])
    # implicit OR between adjacent operands (the default operator)
    assert parse_bool_expr("machine learning") == (
        "or", [("term", "machin"), ("term", "learn")])
    # query-side normalization REMOVES punctuation without spacing (the
    # reference's index/query asymmetry, preserved by query_normalize)
    assert parse_bool_expr("state-of-the-art") == ("term", "stateoftheart")
    # lowercase operators are terms (parse_query convention preserved)
    assert parse_bool_expr("machine and learning") == (
        "or", [("term", "machin"), ("term", "and"), ("term", "learn")])
    assert parse_bool_expr("") is None
    assert parse_bool_expr("''") is None     # nothing survives normalize


def test_parse_errors_and_terms():
    with pytest.raises(ValueError):
        parse_bool_expr("(machine")
    with pytest.raises(ValueError):
        parse_bool_expr("AND machine")
    pos, all_ = expr_terms(parse_bool_expr(
        "(machine OR learning) AND NOT software"))
    assert pos == {"machin", "learn"} and all_ == {"machin", "learn",
                                                   "softwar"}
    # double negation flips back to positive
    pos2, _ = expr_terms(parse_bool_expr("NOT (NOT machine)"))
    assert pos2 == {"machin"}


# ---------------------------------------------------------------------------
# engine vs pure-Python evaluator
# ---------------------------------------------------------------------------


def _eval(node, matched: set) -> bool:
    kind = node[0]
    if kind == "term":
        return node[1] in matched
    if kind == "not":
        return not _eval(node[1], matched)
    vals = [_eval(c, matched) for c in node[1]]
    return all(vals) if kind == "and" else any(vals)


def _expected(built, expr: str, k: int = 10):
    ast = parse_bool_expr(expr)
    if ast is None:
        return []
    pos_terms, all_terms = expr_terms(ast)
    if not pos_terms:
        return []
    rows = [r for r in built.postings.collect() if r["term"] in all_terms]
    df = defaultdict(int)
    for r in rows:
        df[r["term"]] += 1
    idf = {t: math.log((built.n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
           for t in df}
    matched = defaultdict(set)
    score = defaultdict(float)
    for r in rows:
        matched[r["doc_id"]].add(r["term"])
        if r["term"] in pos_terms:
            w = (r["tf"] * (K1 + 1.0)) / (
                r["tf"] + K1 * (1.0 - B + B * (r["dl"] / built.avgdl)))
            score[r["doc_id"]] += idf[r["term"]] * w
    hits = [d for d, m in matched.items() if _eval(ast, m)]
    hits.sort(key=lambda d: (-score[d], d))
    return [(d, score[d]) for d in hits[:k]]


@pytest.mark.parametrize("expr", [
    "(machine OR learning) AND NOT software",
    "machine AND (learning OR software)",
    "(zzzymissing OR machine) AND NOT (zzzymissing2 AND machine)",
    "machine AND NOT machine",
    "NOT machine",
    "learning OR engineering AND NOT machine",
])
def test_bool_query_matches_pure_python(built, expr):
    got = bool_query_topk(built.postings, built.dictionary, built.docs,
                          expr, built.n_docs, built.avgdl, k=10).collect()
    want = _expected(built, expr, k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["score"], s, rel_tol=1e-12, abs_tol=1e-12)


def test_bool_query_negated_terms_do_not_score(built):
    """Docs qualifying under '(a OR b) AND NOT c' score exactly what the
    plain OR query over a,b gives them — the prohibited clause gates
    membership but never scores (Lucene MUST_NOT semantics)."""
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive

    got = bool_query_topk(built.postings, built.dictionary, built.docs,
                          "(machine OR learning) AND NOT software",
                          built.n_docs, built.avgdl, k=10).collect()
    assert got
    plain = {r["doc_id"]: r["score"] for r in bm25_topk_exhaustive(
        built.postings, built.dictionary, built.docs, "machine learning",
        built.n_docs, built.avgdl, k=10_000).collect()}
    for r in got:
        assert r["score"] == plain[r["doc_id"]]


def test_bool_query_flat_and_equivalence(built):
    """'a AND b' through the nested-expression plan is bit-identical to
    the flat boolean mode (the reference-compat path)."""
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive

    got = bool_query_topk(built.postings, built.dictionary, built.docs,
                          "machine AND learning", built.n_docs,
                          built.avgdl, k=10).collect()
    want = bm25_topk_exhaustive(built.postings, built.dictionary,
                                built.docs, "machine AND learning",
                                built.n_docs, built.avgdl, k=10).collect()
    assert [(r["rank"], r["doc_id"], r["url"], r["score"]) for r in got] == \
           [(r["rank"], r["doc_id"], r["url"], r["score"]) for r in want]
    assert got


def test_query_service_bool_expr_routing(spark, tmp_path, built):
    """A parenthesized/NOT query routes to bool_query_topk through the
    service, identical to the direct call; tombstones apply."""
    import importlib.util
    from pathlib import Path

    from ir_index_construction_spark.sources.catalog import Catalog

    spec = importlib.util.spec_from_file_location(
        "submit_query_bool",
        Path(__file__).resolve().parent.parent / "tools" / "submit_query.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    cat = Catalog(str(tmp_path / "cat_bool"))
    txn = cat.transaction()
    txn.write(built.postings, "postings")
    txn.write(built.docs, "docs")
    txn.write(built.dictionary, "dictionary")
    txn.write(spark.createDataFrame(
        [(built.n_docs, built.avgdl, 1)],
        "n_docs long, avgdl double, n_terms long"), "stats")
    txn.commit()

    svc = m.QueryService(spark, cat)
    expr = "(machine OR learning) AND NOT software"
    got = svc.run(expr, 10, "wand", False).orderBy("rank").collect()
    want = bool_query_topk(built.postings, built.dictionary, built.docs,
                           expr, built.n_docs, built.avgdl, k=10) \
        .orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["url"], r["score"]) for r in got] == \
           [(r["rank"], r["doc_id"], r["url"], r["score"]) for r in want]
    assert got

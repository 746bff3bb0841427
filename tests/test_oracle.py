"""Oracle + corpus generator invariants (SURVEY.md §5.2 items 1, 5)."""

from ir_index_construction_spark.corpusgen import HEAD_TERM, make_corpus, make_doc
from ir_index_construction_spark.text import defrag_url, is_valid_url

from tests.oracle import build_index, search


def test_corpus_determinism():
    a = make_doc(7)
    b = make_doc(7)
    assert a == b
    assert make_doc(7, seed=43) != a


def test_corpus_plants_edge_cases():
    rows = make_corpus(300)
    urls = [r["url"] for r in rows]
    assert any("#" in u for u in urls), "fragment dups planted"
    assert any(not is_valid_url(defrag_url(u)) for u in urls), "invalid urls planted"
    assert len(set(defrag_url(u) for u in urls)) < len(urls), "dedup exercised"


def test_index_invariants():
    rows = make_corpus(300)
    idx = build_index(rows)
    # dedup + validity: fewer docs than rows, ids dense 0..N-1
    assert 0 < idx.n_docs < len(rows)
    assert sorted(idx.doc_url) == list(range(idx.n_docs))
    # urls sorted by id (deterministic assignment)
    urls = [idx.doc_url[i] for i in range(idx.n_docs)]
    assert urls == sorted(urls)
    # df == distinct docs per term; sum tf per doc == doc_len
    by_doc = {}
    for term, posting in idx.postings.items():
        assert len(posting) == idx.df(term)
        for d, (tf, imp) in posting.items():
            assert tf >= 1 and imp in (10, 12, 14, 16, 18, 20)
            by_doc[d] = by_doc.get(d, 0) + tf
    for d, total in by_doc.items():
        assert total == idx.doc_len[d]
    # planted head term is in >90% of docs (skew fixture)
    assert idx.df(HEAD_TERM) > 0.9 * idx.n_docs


def test_oracle_search_semantics():
    idx = build_index(make_corpus(300))
    res = search(idx, "machine learning", k=10)
    assert 0 < len(res) <= 10
    scores = [r[3] for r in res]
    assert scores == sorted(scores, reverse=True)
    ranks = [r[0] for r in res]
    assert ranks == list(range(1, len(res) + 1))
    # ties broken by doc_id asc
    for a, b in zip(res, res[1:]):
        assert a[3] > b[3] or (a[3] == b[3] and a[1] < b[1])
    # AND with an absent term -> empty (searcher.py:153-155)
    assert search(idx, "machine AND zzzymissing") == []
    # AND is a subset of OR candidates and scores match
    and_res = search(idx, "machine AND learning", k=10)
    or_docs = {r[1]: r[3] for r in search(idx, "machine learning", k=10000)}
    for _, d, _, s in and_res:
        assert abs(or_docs[d] - s) < 1e-12
    # empty / filtered-to-nothing queries
    assert search(idx, "") == []
    assert search(idx, "!!!") == []
    assert search(idx, "20245") == []   # invalid token still queries; absent from index

"""Pure-Python single-process oracle for the engine (SURVEY.md §5.2).

Reference-faithful corpus semantics (defrag -> validity filter -> first-
occurrence dedup -> weighted-zone extraction -> normalize/stem/filter ->
tf/imp accumulation, /root/reference/indexer.py:152-228) with the engine's
declared scoring config: BM25 k1=1.2 b=0.75,
idf = ln((N-df+0.5)/(df+0.5)+1), dl = kept-token count, tie-break
(score DESC, doc_id ASC).  doc_ids are the url-sorted dense rank — the
engine's deterministic id assignment (SURVEY.md §2 O5).

This module is deliberately slow-and-obvious: dicts and loops, no Spark,
no numpy.  It is the single source of truth for golden fixtures.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ir_index_construction_spark.text import (
    defrag_url,
    doc_term_stats,
    extract_text,
    extract_zones,
    is_valid_url,
    make_cached_stemmer,
    parse_query,
)

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    doc_url: dict = field(default_factory=dict)    # doc_id -> url
    doc_len: dict = field(default_factory=dict)    # doc_id -> int
    postings: dict = field(default_factory=dict)   # term -> {doc_id: (tf, imp)}

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


def build_index(rows) -> OracleIndex:
    """rows: iterables of dicts with url/warc_ts/html (corpusgen rows).
    Processing order is warc_ts (the reference's walk order analogue);
    ids are assigned by url rank afterwards."""
    kept = {}
    for row in sorted(rows, key=lambda r: r["warc_ts"]):
        url = defrag_url(row["url"])
        if url in kept:
            continue
        if not is_valid_url(url):
            continue
        kept[url] = row["html"]

    idx = OracleIndex()
    stemmer = make_cached_stemmer()
    for doc_id, url in enumerate(sorted(kept)):
        html = kept[url]
        stats = doc_term_stats(extract_zones(html), stemmer)
        idx.doc_url[doc_id] = url
        idx.doc_len[doc_id] = sum(tf for tf, _ in stats.values())
        for term, (tf, imp) in stats.items():
            idx.postings.setdefault(term, {})[doc_id] = (tf, imp)
    idx.n_docs = len(idx.doc_url)
    idx.avgdl = (
        sum(idx.doc_len.values()) / idx.n_docs if idx.n_docs else 0.0
    )
    return idx


def idf(index: OracleIndex, term: str) -> float:
    df = index.df(term)
    return math.log((index.n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_score(index: OracleIndex, terms, doc_id: int,
               weighted: bool = False) -> float:
    """Canonical summation order: one contribution per DISTINCT term in
    first-occurrence query order, each weighted (mult*idf)*w where mult
    is the term's multiplicity in the query list.  This is exactly the
    engine scorer's accumulation (operators/topk.py decodes each distinct
    term once and multiplies by mult), so scores stay BIT-identical even
    for queries with repeated non-adjacent terms ('learning machine
    learning').

    weighted=True multiplies each contribution by imp/10 — BM25 x
    tag-importance, the engine's transplant of the reference's
    tf-idf x s zone ranking (searcher.py:123-143; imp = max zone weight
    per (term, doc), indexer.py:55-63, default zone 10 -> neutral 1.0).
    Float op order: w, then w*(imp/10.0), then *(mult*idf) — identical
    to codec.encode_chunks' block_max_wscore and both engine scorers."""
    dl = index.doc_len[doc_id]
    norm = K1 * (1.0 - B + B * (dl / index.avgdl if index.avgdl else 0.0))
    counts: dict = {}
    for t in terms:
        counts[t] = counts.get(t, 0) + 1
    score = 0.0
    for t in dict.fromkeys(terms):
        posting = index.postings.get(t)
        if not posting or doc_id not in posting:
            continue
        tf, imp = posting[doc_id]
        # canonical float op order shared with the engine (codec.bm25_tf_norm
        # then *(mult*idf)): keeps engine scores BIT-identical, and keeps
        # the block-max bound idf*max(w) exactly monotone vs idf*w.
        w = tf * (K1 + 1.0) / (tf + norm)
        if weighted:
            w = w * (imp / 10.0)
        score += (counts[t] * idf(index, t)) * w
    return score


def search(index: OracleIndex, query: str, k: int = 10,
           weighted: bool = False):
    """Top-k [(rank, doc_id, url, score)] with (score DESC, doc_id ASC)."""
    terms, is_bool = parse_query(query)
    if not terms:
        return []

    candidates = None
    if is_bool:
        for t in terms:
            posting = index.postings.get(t)
            if not posting:
                return []                       # searcher.py:153-155
            docs = set(posting)
            candidates = docs if candidates is None else candidates & docs
        if not candidates:
            return []
    else:
        candidates = set()
        for t in terms:
            candidates.update(index.postings.get(t, ()))
        if not candidates:
            return []

    scored = [(bm25_score(index, terms, d, weighted), d) for d in candidates]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [
        (rank + 1, d, index.doc_url[d], s)
        for rank, (s, d) in enumerate(scored[:k])
    ]


def extract_oracle(html) -> str:
    """Byte-identity target for the extraction UDF."""
    return extract_text(html)

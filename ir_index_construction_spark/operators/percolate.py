"""Percolator — reverse search: match DOCUMENTS against a registry of
standing QUERIES (the Elasticsearch percolate query / Lucene Monitor
"saved-search alerting" shape).  A crawl pipeline uses this to answer
"which subscribers' alerts does this new page trigger?" — the query set
is small and long-lived, the document stream is the 100-TB side.

Scale shape — the inversion is what makes this cheap:

  * the registry explodes to one row per (query_id, term); a few
    thousand standing queries is a few-thousand-row frame that
    BROADCASTS.  The document side never shuffles against it.
  * matching is: distinct doc terms -> broadcast-hash-join on term ->
    one (doc_id, query_id) hash agg counting matched distinct terms.
    Partial aggregation runs map-side, so the shuffle carries at most
    one row per (doc, candidate query) — candidates only, not the
    cross product.
  * AND queries keep pairs where every registered term matched
    (n_matched == n_terms); OR queries keep any overlap.  Both
    evaluate from the same agg — no per-mode scan.

Batch-tier here; the same call composes unchanged inside a
foreachBatch over a document stream (each micro-batch percolates
against the broadcast registry — see tests), which is the alerting
deployment.

Beyond-reference capability (the reference engine has no standing-query
surface); the query-parse path is the engine's own
(text/normalize.parse_query), so registered queries stem and split
exactly like ad-hoc ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..text.normalize import parse_query


def register_queries(spark: SparkSession, queries: dict,
                     stem: bool = True) -> DataFrame:
    """Parse a {query_id: query string} registry into the exploded
    (query_id, term, n_terms, is_bool) frame ``percolate`` consumes.
    Terms dedup per query (a repeated word is one match requirement);
    a query with no indexable tokens registers nothing (matches no
    doc — same contract as an empty ad-hoc query).  ``stem=False``
    skips Porter for unstemmed token streams (the SQL-parity tier)."""
    rows = []
    for qid, qtext in sorted(queries.items()):
        if stem:
            terms, is_bool = parse_query(qtext)
        else:
            # unstemmed tier: normalize punctuation with the SAME rule
            # as the unstemmed document tokenizer (non-alnum -> space,
            # then split) — query_normalize DELETES punctuation, which
            # would turn 'data-stream' into the never-indexed token
            # 'datastream' while the doc side indexes 'data','stream'
            # (round-4 ADVICE)
            import re
            terms = re.sub(r"[^a-z0-9\s]", " ", qtext.lower()).split()
            is_bool = "AND" in qtext.split()
            if is_bool:
                terms = [t for t in terms if t != "and"]
        uniq = sorted(set(terms))
        for t in uniq:
            rows.append((str(qid), t, len(uniq), bool(is_bool)))
    if not rows:
        return spark.createDataFrame(
            [], "query_id string, term string, n_terms int, is_bool boolean")
    return spark.createDataFrame(
        rows, "query_id string, term string, n_terms int, is_bool boolean")


def percolate(doc_terms: DataFrame, registry: DataFrame) -> DataFrame:
    """Match documents against the registered queries.

    ``doc_terms``: (doc_id, term) — need not be pre-deduplicated
    (matching is on DISTINCT terms; tf is irrelevant to percolation).
    ``registry``: output of ``register_queries``.

    Returns (query_id, doc_id, n_matched) — one row per triggered
    (standing query, document) pair, AND queries requiring all their
    terms, OR queries any.  The broadcast join runs FIRST so the
    registry prunes the token stream map-side (non-query terms — the
    overwhelming majority — never reach a shuffle); the one shuffle is
    the (query_id, doc_id) distinct-term count agg over candidate rows
    only, map-side combined."""
    hits = (
        doc_terms.select("doc_id", "term")
        .join(F.broadcast(registry), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("term").cast("int").alias("n_matched"),
             F.first("n_terms").alias("_need"),
             F.first("is_bool").alias("_bool"))
    )
    return (
        hits.filter((~F.col("_bool")) | (F.col("n_matched") == F.col("_need")))
        .select("query_id", "doc_id", "n_matched")
    )

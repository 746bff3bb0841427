"""Hybrid lexical+vector search: reciprocal-rank fusion (RRF).

The modern retrieval shape the reference's BM25-only engine cannot
express: one query runs BOTH the inverted-index path (WAND top-depth)
and the embedding path (cosine top-depth over an ANN or brute-force
scan), and the result lists fuse by rank with

    rrf(doc) = sum over lists  1 / (k0 + rank_list(doc))

(Cormack/Clarke/Buettcher, SIGIR 2009; the formula Elasticsearch and
OpenSearch ship as their hybrid default, k0 = 60).  Rank fusion beats
score fusion operationally because BM25 scores and cosines live on
incomparable scales — no per-query min/max normalization state is
needed, which is what makes it safe at 100 TB: each retriever returns
its top ``depth`` rows (driver-bounded, never data-sized), and the
fusion itself is arithmetic over <= len(lists) * depth rows.

Scale notes: both candidate lists arrive ALREADY top-k-selected by
distributed plans (WAND shard scorers / TakeOrderedAndProject), so the
fusion union is tiny; the url back-join broadcasts the fused top-k at
the end, same as every other query plan.  Determinism: ranks are total
orders (score desc, id asc tie-break) and the per-doc RRF sum has one
addend per list — with the standard two retrievers the float sum is
commutative-exact, so the fused ranking is bit-stable across engines
(the q66 DuckDB twin hash-checks it end to end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RRF_K0 = 60  # the constant from the RRF paper; ES/OpenSearch default


def with_rank(scored: DataFrame, order_col: str, id_col: str = "doc_id",
              depth: int = 50) -> DataFrame:
    """(id, rank) from a scored frame: rank by (order_col DESC, id ASC)
    — the engine-wide total-order tie-break — truncated to ``depth``.
    The global window is intentional and safe: every caller passes a
    frame that is already top-k-selected (<= depth-ish rows), so the
    single-partition sort touches driver-bounded data only."""
    w = Window.orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    return (scored
            .select(F.col(id_col).alias("doc_id"),
                    F.row_number().over(w).cast("int").alias("rank"))
            .filter(F.col("rank") <= depth))


def rrf_fuse(ranked_lists: list, k: int = 10, k0: int = RRF_K0) -> DataFrame:
    """Fuse (doc_id, rank) frames by reciprocal-rank sum; returns
    (doc_id, score) for the top ``k`` fused docs.  A doc absent from a
    list simply contributes no addend for it (standard RRF)."""
    parts = [r.select("doc_id",
                      (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank")))
                      .alias("score"))
             for r in ranked_lists]
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    return (fused.groupBy("doc_id").agg(F.sum("score").alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def hybrid_topk(index: DataFrame, dictionary: DataFrame, docs: DataFrame,
                emb: DataFrame, id_col: str, vec_col: str,
                query: str, query_vec: list, n_docs: int, avgdl: float,
                k: int = 10, depth: int = 50, k0: int = RRF_K0,
                bm25=None, vector_ranked: DataFrame | None = None,
                **wand_kwargs) -> DataFrame:
    """TOPK (rank, doc_id, url, score) — BM25 WAND fused with embedding
    cosine by RRF.  ``emb`` joins the corpus on ``id_col`` == doc_id
    (one embedding per doc, the ingest contract).  ``vector_ranked``
    overrides the brute-force cosine scan with a caller-supplied
    (id-or-doc_id, cosine) frame — plug in lsh_bucketed_topk / ivf_topk
    for the ANN scale path; brute force is the exactness default.
    ``wand_kwargs`` pass through to the lexical leg (weighted=, boosts=,
    exclude_ids=, ...)."""
    from ..config import BM25Config
    from ..operators.similarity import cosine_topk_bruteforce
    from ..operators.topk import wand_topk

    lex = wand_topk(index, dictionary, docs, query, n_docs, avgdl,
                    k=depth, bm25=bm25 or BM25Config(), **wand_kwargs)
    if vector_ranked is None:
        vector_ranked = cosine_topk_bruteforce(
            emb, id_col, vec_col, query_vec, k=depth)
    # an empty leg (zero-hit query / empty ANN probe) contributes no
    # rows to the union — no special-casing needed, ranks stay correct
    lists = [
        with_rank(lex.select("doc_id", "score"), "score", depth=depth),
        with_rank(vector_ranked.withColumnRenamed("id", "doc_id"),
                  "cosine", depth=depth),
    ]
    fused = rrf_fuse(lists, k=k, k0=k0)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (docs.join(F.broadcast(fused), "doc_id", "inner")
            .withColumn("rank", F.row_number().over(win).cast("int"))
            .select("rank", "doc_id", "url", "score"))

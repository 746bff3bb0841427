"""Block-max WAND top-k over the compressed document-sharded index.

Strategy (set-at-a-time BMW — the classic document-at-a-time WAND loop
is a per-doc Python interpreter loop, which is exactly the slow path the
engine avoids; this formulation does the same block-level pruning with
vectorized numpy):

  1. SEED: fully score the highest-(mult*idf) query term in the shard
     (rarest term — cheapest list, tightest scores).  If it yields >= k
     postings, theta = its kth best score.  For every doc d, the full
     score >= the seed partial score, so the kth best FULL score in the
     shard >= theta: theta is a valid WAND threshold.
  2. PRUNE: every posting of term t inside block j lies in the doc-id
     interval (prev_block_last, block_last].  Sweep all terms' block
     intervals (event +ub at start, -ub past end; ub = mult*idf*
     block_max_tf_norm) to get the upper-bound coverage of every
     elementary doc-id interval.  A block whose interval's MAX coverage
     is STRICTLY below theta cannot contain a top-k doc and is never
     decoded.  (Strict: an equal-ub doc could still win its tie on
     doc_id — SURVEY.md §7.2 #4.)
  3. SCORE: decode surviving blocks per term (contiguous-run chunk
     decode), accumulate per-doc sums with one bincount in QUERY-TERM
     ORDER — bit-identical float summation order to the oracle.
  4. Shard-local top-k by (score DESC, doc_id ASC); global merge is a
     TakeOrderedAndProject over k rows per shard.

Boolean AND: pruning is disabled (a seed theta over non-candidates could
over-prune) and candidates must match all distinct terms; any term with
zero global postings empties the result before any job launches.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..config import BM25Config
from ..functions.codec import bm25_tf_norm, decode_chunk
from ..plans.query import empty_topk, query_term_idf
from ..text.normalize import parse_query

_LOCAL_SCHEMA = "doc_id long, score double"


def _sparse_table(values: np.ndarray):
    """O(n log n) range-max structure; query(l, r) inclusive, vectorized."""
    tables = [values]
    j = 1
    n = len(values)
    while (1 << j) <= n:
        prev = tables[-1]
        half = 1 << (j - 1)
        m = n - (1 << j) + 1
        tables.append(np.maximum(prev[:m], prev[half:half + m]))
        j += 1

    def query(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        out = np.empty(len(lo), np.float64)
        span = hi - lo + 1
        jj = np.int64(np.floor(np.log2(span)))
        for level in np.unique(jj):
            m = jj == level
            t = tables[int(level)]
            out[m] = np.maximum(t[lo[m]], t[hi[m] - (1 << int(level)) + 1])
        return out

    return query


class _TermCursor:
    """All chunks of one term within one shard, with flat block tables."""

    __slots__ = ("rows", "block_last", "block_ub", "block_prev",
                 "chunk_block_ranges", "n_postings")

    def __init__(self, g: pd.DataFrame, weight: float, weighted: bool = False):
        g = g.sort_values("chunk")
        self.rows = list(g.itertuples(index=False))
        lasts, ubs, ranges = [], [], []
        off = 0
        for r in self.rows:
            bl = np.asarray(r.block_last_doc, np.int64)
            lasts.append(bl)
            bm = r.block_max_wscore if weighted else r.block_max_score
            ubs.append(np.asarray(bm, np.float64) * weight)
            ranges.append((off, off + len(bl)))
            off += len(bl)
        self.block_last = np.concatenate(lasts)
        self.block_ub = np.concatenate(ubs)
        prev = np.empty_like(self.block_last)
        prev[0] = self.rows[0].first_doc - 1
        prev[1:] = self.block_last[:-1]
        self.block_prev = prev
        self.chunk_block_ranges = ranges
        self.n_postings = int(sum(r.n_postings for r in self.rows))

    def decode(self, sel: np.ndarray | None, with_imp: bool = False):
        """Decode selected blocks (None = all) across chunks.  with_imp
        skips the imp stream entirely for plain-BM25 queries."""
        docs, tfs, dls, imps = [], [], [], []
        for r, (b0, b1) in zip(self.rows, self.chunk_block_ranges):
            csel = None if sel is None else sel[b0:b1]
            if csel is not None and not csel.any():
                continue
            d, t, l, i = decode_chunk(r.payload, r.block_last_doc, csel,
                                      with_imp=with_imp)
            docs.append(d)
            tfs.append(t)
            dls.append(l)
            imps.append(i)
        if not docs:
            z = np.zeros(0, np.int64)
            return z, z, z, z
        return (np.concatenate(docs), np.concatenate(tfs),
                np.concatenate(dls), np.concatenate(imps))


def _as_exclude_array(exclude_ids) -> np.ndarray | None:
    if exclude_ids is None:
        return None
    arr = np.asarray(sorted(exclude_ids), dtype=np.int64)
    return arr if len(arr) else None


def make_shard_scorer(term_meta: dict, ordered_terms: list, k: int,
                      is_bool: bool, avgdl: float, bm25: BM25Config,
                      stats: dict | None = None, weighted: bool = False,
                      exclude_ids=None, bound_scale=None,
                      after: tuple | None = None):
    """term_meta: {term: (mult, idf)}; ordered_terms: distinct terms in
    query order (float-sum order contract with the oracle).  `stats` is a
    local-mode instrumentation dict (blocks_total/blocks_decoded).
    weighted=True scores BM25 x tag-importance (contribution x imp/10,
    the reference's tf-idf x s semantics — searcher.py:123-143 — on the
    engine's BM25 base); block pruning then uses the per-block
    block_max_wscore bound, which is exact for the weighted score.
    exclude_ids: deletion set (tombstoned doc_ids) consulted DURING
    scoring — a deleted doc never enters a heap, and the seed threshold
    is computed over surviving docs only, so pruning can never cut a
    block whose best live doc belongs in the top k.

    bound_scale: [(min_shard, max_shard, factor), ...] per index
    SEGMENT (schemas.INDEX_SEGMENTS) — a segment's stored block-max
    bounds were encoded at its build-time avgdl; when the corpus avgdl
    has since grown, true scores can exceed them.  Multiplying a
    segment's bounds by max(1, avgdl_now/built_avgdl) restores a valid
    upper bound (w grows at most proportionally with avgdl), keeping
    pruning lossless over incrementally appended segments.  Scores
    themselves always use avgdl_now on the decoded tf/dl, so results
    are identical to a full rebuild — only the pruning bound scales.

    after: search-after page cursor (score, doc_id) — the last row of
    the previous page.  Only docs STRICTLY after the cursor in
    (score DESC, doc_id ASC) order qualify, applied to the FINAL sums
    before per-shard top-k selection (like exclude_ids, so backfill is
    correct).  A cursor disables the seed-threshold block pruning:
    theta lower-bounds the k-th best score of the UNFILTERED result,
    which can exceed every page-2 score, so pruning against it would
    cut blocks the page needs (lossless pruning under a cursor needs
    block-MIN metadata the index doesn't carry — deep pages pay the
    exhaustive decode over the term-pruned scan, as search engines
    accept).  Scores are deterministic per index snapshot, so a cursor
    taken from a previous page's row compares exactly."""
    k1, b = bm25.k1, bm25.b
    n_required = len(ordered_terms)
    exclude = _as_exclude_array(exclude_ids)
    scale_ranges = ([(int(lo), int(hi), float(s))
                     for lo, hi, s in bound_scale if float(s) != 1.0]
                    if bound_scale else None)

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        ub_scale = 1.0
        if scale_ranges:
            shard = int(pdf["shard"].iloc[0])
            for lo, hi, s in scale_ranges:
                if lo <= shard <= hi:
                    ub_scale = s
                    break
        cursors = {}
        for term, g in pdf.groupby("term", sort=False):
            mult, idf = term_meta[term]
            # the scale inflates ONLY the block upper bounds (_TermCursor
            # applies weight to block_ub); decoded scores use mult*idf
            cursors[term] = _TermCursor(g, mult * idf * ub_scale, weighted)
        if not cursors or (is_bool and len(cursors) < n_required):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})

        # ---- seed threshold (OR mode, multi-term; unsound under a
        # page cursor — see the `after` docstring note) ----
        theta = -np.inf
        if not is_bool and len(cursors) > 1 and after is None:
            seed = max(cursors, key=lambda t: (term_meta[t][0] * term_meta[t][1], t))
            cur = cursors[seed]
            if cur.n_postings >= k:
                mult, idf = term_meta[seed]
                d, t, l, i = cur.decode(None, with_imp=weighted)
                w = bm25_tf_norm(t, l, avgdl, k1, b)
                if weighted:
                    w = w * (i.astype(np.float64) / 10.0)
                s = (mult * idf) * w
                if exclude is not None:
                    s = s[~np.isin(d, exclude)]
                if len(s) >= k:
                    theta = float(np.partition(s, len(s) - k)[len(s) - k])

        # ---- block pruning via interval coverage sweep ----
        selections = {term: None for term in cursors}
        if theta > -np.inf:
            starts = np.concatenate([c.block_prev + 1 for c in cursors.values()])
            ends = np.concatenate([c.block_last for c in cursors.values()])
            ubs = np.concatenate([c.block_ub for c in cursors.values()])
            pos = np.concatenate([starts, ends + 1])
            delta = np.concatenate([ubs, -ubs])
            order = np.argsort(pos, kind="stable")
            cum = np.cumsum(delta[order])
            uniq, cnt = np.unique(pos[order], return_counts=True)
            cov = cum[np.cumsum(cnt) - 1]       # coverage on [uniq[i], uniq[i+1])
            rmax = _sparse_table(cov)
            for term, c in cursors.items():
                lo = np.searchsorted(uniq, c.block_prev + 1, "right") - 1
                hi = np.searchsorted(uniq, c.block_last, "right") - 1
                keep = rmax(lo, hi) >= theta     # prune only strictly-below
                selections[term] = keep
                if stats is not None:
                    stats["blocks_total"] = stats.get("blocks_total", 0) + len(keep)
                    stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + int(keep.sum())
        elif stats is not None:
            nb = sum(len(c.block_last) for c in cursors.values())
            stats["blocks_total"] = stats.get("blocks_total", 0) + nb
            stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + nb

        # ---- decode + accumulate in query-term order ----
        all_docs, all_scores = [], []
        for term in ordered_terms:
            c = cursors.get(term)
            if c is None:
                continue
            mult, idf = term_meta[term]
            d, t, l, i = c.decode(selections[term], with_imp=weighted)
            w = bm25_tf_norm(t, l, avgdl, k1, b)
            if weighted:
                w = w * (i.astype(np.float64) / 10.0)
            s = (mult * idf) * w
            if exclude is not None:
                keep = ~np.isin(d, exclude)
                d, s = d[keep], s[keep]
            all_docs.append(d)
            all_scores.append(s)
        docs_cat = np.concatenate(all_docs)
        if len(docs_cat) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        scores_cat = np.concatenate(all_scores)
        uniq_docs, inv = np.unique(docs_cat, return_inverse=True)
        sums = np.bincount(inv, weights=scores_cat, minlength=len(uniq_docs))

        if is_bool:
            hits = np.bincount(inv, minlength=len(uniq_docs))
            m = hits == n_required            # (term,doc) unique => count == #terms
            uniq_docs, sums = uniq_docs[m], sums[m]
            if len(uniq_docs) == 0:
                return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                     "score": pd.Series([], dtype="float64")})

        if after is not None:
            cs, cd = float(after[0]), int(after[1])
            m = (sums < cs) | ((sums == cs) & (uniq_docs > cd))
            uniq_docs, sums = uniq_docs[m], sums[m]
            if len(uniq_docs) == 0:
                return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                     "score": pd.Series([], dtype="float64")})

        order = np.lexsort((uniq_docs, -sums))[:k]
        return pd.DataFrame({"doc_id": uniq_docs[order],
                             "score": sums[order]})

    return score_shard


def wand_topk(index: DataFrame, dictionary: DataFrame, docs: DataFrame,
              query: str, n_docs: int, avgdl: float, k: int = 10,
              bm25: BM25Config = BM25Config(), weighted: bool = False,
              pre_parsed: tuple | None = None,
              idf_cache: dict | None = None,
              exclude_ids=None, bound_scale=None,
              after: tuple | None = None,
              boosts: dict | None = None) -> DataFrame:
    """TOPK (rank, doc_id, url, score) via the compressed index.

    Plan: term-filtered scan of the index (parquet row-group pruning on
    the term-sorted layout) -> shard-local BMW scorer (no shuffle of
    postings; groupBy(shard) moves only the query terms' chunk rows,
    which are already co-partitioned by shard on disk) -> global
    TakeOrderedAndProject over <= k rows per shard -> broadcast back-join
    for urls.

    weighted=True ranks by BM25 x tag-importance (imp/10 multiplier, the
    reference's searcher.py:123-143 zone semantics on the BM25 base).
    pre_parsed=(terms, is_bool) bypasses parse_query (e.g. for indexes
    built without stemming, where the query must not be stemmed).

    exclude_ids: optional deletion set (tombstoned doc_ids, see
    plans/maintenance.py) applied DURING shard scoring — the
    merge-on-read query path between purge cycles.  Bounded by takedown
    volume, it ships to executors inside the scorer closure (a
    deletion-bitmap analogue); correct under-k backfill is preserved
    because exclusion happens before per-shard top-k selection, and the
    idf/avgdl corpus stats intentionally stay those of the committed
    index (matching a rebuilt-minus-deletions index requires the
    rebuild).

    after=(score, doc_id): search-after pagination cursor — the last
    row of the previous page; returns the NEXT k results (rank restarts
    at 1 for the page).  See make_shard_scorer for the pruning
    contract.

    boosts: optional {stemmed term: weight} (text/normalize.
    parse_boosted_query, the Lucene ``term^2.5`` clause weight) —
    multiplies that term's idf in the scorer metadata.  WAND pruning
    stays exact because the block-max bound and the true contribution
    are BOTH (mult*idf)*tf_norm: scaling idf scales them together."""
    spark = index.sparkSession
    terms, is_bool = pre_parsed if pre_parsed is not None else parse_query(query)
    if not terms or n_docs == 0 or avgdl == 0:
        return empty_topk(spark)

    tf_idf = query_term_idf(spark, dictionary, terms, n_docs, cache=idf_cache)
    counts = Counter(terms)
    ordered = [t for t in dict.fromkeys(terms) if t in tf_idf]
    if is_bool and len(ordered) < len(counts):
        return empty_topk(spark)          # absent AND-term (searcher.py:153-155)
    if not ordered:
        return empty_topk(spark)
    term_meta = {
        t: (counts[t],
            tf_idf[t][1] * (boosts.get(t, 1.0) if boosts else 1.0))
        for t in ordered
    }

    rows = index.filter(F.col("term").isin(ordered))
    scorer = make_shard_scorer(term_meta, ordered, k, is_bool, avgdl, bm25,
                               weighted=weighted, exclude_ids=exclude_ids,
                               bound_scale=bound_scale, after=after)
    local = rows.groupBy("shard").applyInPandas(scorer, _LOCAL_SCHEMA)
    topk = local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    return (
        docs.join(F.broadcast(topk), "doc_id", "inner")
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ).cast("int"))
        .select("rank", "doc_id", "url", "score")
    )


_BATCH_LOCAL_SCHEMA = "query_id string, doc_id long, score double"


def make_batch_shard_scorer(specs: list, k: int, avgdl: float,
                            bm25: BM25Config, weighted: bool = False,
                            exclude_ids=None):
    """Score a whole query WORKLOAD in one pass over each shard.

    specs: [(query_id, ordered_terms, {term: (mult, idf)}, is_bool,
    n_required)].  Every term the workload touches is decoded + tf-
    normalized ONCE per shard and reused by every query that contains it
    — with a realistic workload's Zipfian term overlap, decode cost is
    amortized across queries instead of paid per query.  Block pruning
    is intentionally skipped: per-query pruning would re-decode
    overlapping block subsets per query, which at batch sizes > ~2
    costs more than it saves (and pruning is score-lossless, so results
    are unchanged).  Per-query accumulation order is identical to the
    single-query scorer (query-term-ordered concat -> bincount), so each
    query's rows are bit-identical to its wand_topk() output."""
    k1, b = bm25.k1, bm25.b
    exclude = _as_exclude_array(exclude_ids)

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded = {}
        for term, g in pdf.groupby("term", sort=False):
            c = _TermCursor(g, 1.0, weighted)
            d, t, l, i = c.decode(None, with_imp=weighted)
            w = bm25_tf_norm(t, l, avgdl, k1, b)
            if weighted:
                w = w * (i.astype(np.float64) / 10.0)
            if exclude is not None:
                keep = ~np.isin(d, exclude)
                d, w = d[keep], w[keep]
            decoded[term] = (d, w)

        out_q, out_d, out_s = [], [], []
        for qid, ordered, meta, is_bool, n_required in specs:
            present = [t for t in ordered if t in decoded]
            if not present or (is_bool and len(present) < n_required):
                continue
            docs_cat = np.concatenate([decoded[t][0] for t in present])
            if len(docs_cat) == 0:
                continue
            scores_cat = np.concatenate(
                [(meta[t][0] * meta[t][1]) * decoded[t][1] for t in present])
            uniq_docs, inv = np.unique(docs_cat, return_inverse=True)
            sums = np.bincount(inv, weights=scores_cat, minlength=len(uniq_docs))
            if is_bool:
                hits = np.bincount(inv, minlength=len(uniq_docs))
                m = hits == n_required
                uniq_docs, sums = uniq_docs[m], sums[m]
                if len(uniq_docs) == 0:
                    continue
            order = np.lexsort((uniq_docs, -sums))[:k]
            out_q.append(np.full(len(order), qid, dtype=object))
            out_d.append(uniq_docs[order])
            out_s.append(sums[order])
        if not out_d:
            return pd.DataFrame({"query_id": pd.Series([], dtype="object"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "doc_id": np.concatenate(out_d),
                             "score": np.concatenate(out_s)})

    return score_shard


def wand_topk_batch(index: DataFrame, dictionary: DataFrame, docs: DataFrame,
                    queries: dict, n_docs: int, avgdl: float, k: int = 10,
                    bm25: BM25Config = BM25Config(), weighted: bool = False,
                    pre_parsed: dict | None = None,
                    idf_cache: dict | None = None,
                    exclude_ids=None) -> DataFrame:
    """Evaluate a query WORKLOAD in one Spark job: (query_id, rank,
    doc_id, url, score), rank-partitioned per query, each query's rows
    bit-identical to its single-query wand_topk() result.

    Per-query wand_topk pays fixed per-job costs (driver scheduling,
    Python-worker round trip, broadcast) that dominate latency once the
    index is pruned well — ~1s/query at local scale, and on a 1000-
    executor cluster a whole scheduling wave per query.  A batch
    evaluator is the shape a training-data pipeline actually needs
    (score 10^4 mined queries against the corpus): ONE term-filtered
    index scan covering the union of all query terms, shard-local
    scoring of every query per shard (terms decoded once, reused across
    queries), one window rank over <= n_queries x n_shards x k rows,
    one broadcast url back-join.  Driver-side work stays O(total query
    terms): one dictionary lookup job for the union term set.

    queries: {query_id: query_text}.  pre_parsed: {query_id: (terms,
    is_bool)} bypasses parse_query (unstemmed indexes).  Queries whose
    terms are all absent (or boolean queries missing any term —
    searcher.py:153-155) contribute zero rows, exactly like their
    single-query empty result."""
    spark = index.sparkSession
    parsed = {}
    for qid, text in queries.items():
        parsed[qid] = (pre_parsed[qid] if pre_parsed and qid in pre_parsed
                       else parse_query(text))

    union_terms = sorted({t for terms, _ in parsed.values() for t in terms})
    empty = spark.createDataFrame([], "query_id string, rank int, doc_id long,"
                                      " url string, score double")
    if not union_terms or n_docs == 0 or avgdl == 0:
        return empty
    tf_idf = query_term_idf(spark, dictionary, union_terms, n_docs,
                            cache=idf_cache)

    specs = []
    for qid, (terms, is_bool) in parsed.items():
        counts = Counter(terms)
        ordered = [t for t in dict.fromkeys(terms) if t in tf_idf]
        if not ordered or (is_bool and len(ordered) < len(counts)):
            continue                       # empty result for this query
        meta = {t: (counts[t], tf_idf[t][1]) for t in ordered}
        specs.append((qid, ordered, meta, is_bool, len(ordered)))
    if not specs:
        return empty

    needed = sorted({t for _, ordered, *_ in specs for t in ordered})
    rows = index.filter(F.col("term").isin(needed))
    scorer = make_batch_shard_scorer(specs, k, avgdl, bm25, weighted=weighted,
                                     exclude_ids=exclude_ids)
    local = rows.groupBy("shard").applyInPandas(scorer, _BATCH_LOCAL_SCHEMA)
    win = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    topk = (local.withColumn("rank", F.row_number().over(win).cast("int"))
            .filter(F.col("rank") <= k))
    return (
        docs.join(F.broadcast(topk), "doc_id", "inner")
        .select("query_id", "rank", "doc_id", "url", "score")
    )

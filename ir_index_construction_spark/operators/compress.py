"""Compressed index construction with explicit head-term skew salting.

Two-phase salted aggregation (SURVEY.md §4.3 — Catalyst's AQE handles
join skew but not aggregation skew, so this is explicit):

  phase 1  postings.groupBy(shard, term_bucket, salt).applyInPandas
           -> per-term SORTED packed runs.  The salt (hash(doc_id) % S)
           spreads a head term's postings over S reducers, so no single
           task sees more than ~1/S of "the"'s postings in a shard.
           This is also a shuffle COMPACTION: downstream moves one packed
           binary row per (term, salt), not one row per posting.

  phase 2  runs.groupBy(shard, term_bucket).applyInPandas
           -> merge each term's S sorted runs in doc_id order and encode
           delta+varbyte blocks with block-max metadata (codec.py).

The index is document-sharded (shard = doc_id // shard_size): all terms
of a doc range live together, so query-time WAND is shard-local with no
per-query shuffle, and chunk rows bound parquet row size for head terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import BM25Config, IndexConfig
from ..functions.codec import encode_chunks_many
from ..schemas import INDEX, SALTED_RUNS


def _with_keys(postings: DataFrame, cfg: IndexConfig,
               doc_base: int = 0, shard_offset: int = 0) -> DataFrame:
    """doc_base/shard_offset: segment-local shard numbering for
    incremental appends (streaming/incremental.py) — streamed doc_ids
    start at a huge per-batch base, so ``doc_id // shard_size`` would
    overflow int and scatter; instead the segment claims the next
    contiguous shard range: shard = offset + (doc_id - base) // size.
    Shard is only a locality/grouping key — real doc_ids live in the
    encoded payloads — so any disjoint numbering is valid."""
    return (
        postings
        .withColumn("shard", (
            (F.col("doc_id") - F.lit(doc_base)) / F.lit(cfg.shard_size)
            + F.lit(shard_offset)).cast("long"))
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int"))
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets)).cast("int"))
    )


def _pack_runs(pdf: pd.DataFrame):
    """One (shard, tb, salt) group -> one packed run row per term.

    Vectorized: one factorize + one lexsort over the whole group, then
    per-term boundary slicing — a pandas groupby here costs ~75us per
    term group (hundreds of thousands per build), which dominated the
    pack stage."""
    shard = int(pdf["shard"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    codes, uniques = pd.factorize(pdf["term"], sort=False)
    doc = pdf["doc_id"].to_numpy(np.int64)
    order = np.lexsort((doc, codes))
    codes_s = codes[order]
    doc_s = doc[order]
    tf_s = pdf["tf"].to_numpy(np.int32)[order]
    dl_s = pdf["dl"].to_numpy(np.int32)[order]
    imp_s = pdf["imp"].to_numpy(np.int32)[order]
    bounds = np.flatnonzero(np.diff(codes_s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(codes_s)]))
    out = [
        (shard, uniques[codes_s[s]], salt, int(e - s),
         doc_s[s:e].tobytes(), tf_s[s:e].tobytes(),
         dl_s[s:e].tobytes(), imp_s[s:e].tobytes())
        for s, e in zip(starts, ends)
    ]
    return pd.DataFrame(out, columns=["shard", "term", "salt", "n",
                                      "doc_ids", "tfs", "dls", "imps"])


def _make_encode_group(avgdl: float, bm25: BM25Config, cfg: IndexConfig):
    def encode_group(pdf: pd.DataFrame):
        shard = int(pdf["shard"].iloc[0])
        # unpack every salted run, tag postings with a term code, and
        # sort ONCE by (term, doc_id) — the lexsort IS the merge of each
        # term's S sorted salted runs (doc_ids are globally unique per
        # term, SURVEY.md §7.2 #3) — then hand the whole group to the
        # batched encoder (codec.encode_chunks_many): all weights/blocks/
        # varbyte streams are computed in single whole-group numpy passes
        codes, uniques = pd.factorize(pdf["term"], sort=False)
        run_docs = [np.frombuffer(b, np.int64) for b in pdf["doc_ids"]]
        run_lens = np.array([len(d) for d in run_docs], np.int64)
        term_idx = np.repeat(codes, run_lens)
        doc_all = np.concatenate(run_docs)
        tf_all = np.concatenate([np.frombuffer(b, np.int32) for b in pdf["tfs"]])
        dl_all = np.concatenate([np.frombuffer(b, np.int32) for b in pdf["dls"]])
        imp_all = np.concatenate([np.frombuffer(b, np.int32) for b in pdf["imps"]])
        order = np.lexsort((doc_all, term_idx))
        term_s = term_idx[order]
        bounds = np.flatnonzero(np.diff(term_s)) + 1
        term_starts = np.concatenate(([0], bounds))
        term_ends = np.concatenate((bounds, [len(term_s)]))

        per_term = encode_chunks_many(
            doc_all[order], tf_all[order], dl_all[order], imp_all[order],
            term_starts, avgdl=avgdl, k1=bm25.k1, b=bm25.b,
            block_size=cfg.block_size, chunk_blocks=cfg.chunk_blocks)

        rows = []
        for t, chunks in enumerate(per_term):
            term = uniques[term_s[term_starts[t]]]
            df_shard = int(term_ends[t] - term_starts[t])
            for c in chunks:
                rows.append((shard, term, c["chunk"], df_shard,
                             c["n_postings"], c["first_doc"], c["last_doc"],
                             c["payload"], c["block_last_doc"],
                             c["block_max_score"], c["block_max_wscore"]))
        return pd.DataFrame(rows, columns=[f.name for f in INDEX.fields])

    return encode_group


def build_compressed_index(postings: DataFrame, avgdl: float,
                           bm25: BM25Config = BM25Config(),
                           cfg: IndexConfig = IndexConfig(),
                           doc_base: int = 0,
                           shard_offset: int = 0) -> DataFrame:
    """postings (term, doc_id, tf, imp, dl) -> INDEX DataFrame.
    doc_base/shard_offset: see _with_keys (incremental segments)."""
    keyed = _with_keys(postings, cfg, doc_base, shard_offset)
    runs = keyed.groupBy("shard", "tb", "salt").applyInPandas(
        _pack_runs, schema=SALTED_RUNS
    )
    runs = runs.withColumn(
        "tb", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int")
    )
    return runs.groupBy("shard", "tb").applyInPandas(
        _make_encode_group(avgdl, bm25, cfg), schema=INDEX
    )

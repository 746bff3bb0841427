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
from ..functions.codec import encode_chunks
from ..schemas import INDEX, SALTED_RUNS


def _with_keys(postings: DataFrame, cfg: IndexConfig) -> DataFrame:
    return (
        postings
        .withColumn("shard", (F.col("doc_id") / F.lit(cfg.shard_size)).cast("int"))
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int"))
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets)).cast("int"))
    )


def _pack_runs(pdf: pd.DataFrame):
    """One (shard, tb, salt) group -> one packed run row per term."""
    shard = int(pdf["shard"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    out = []
    for term, g in pdf.groupby("term", sort=False):
        order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        out.append((
            shard, term, salt, len(g),
            g["doc_id"].to_numpy(np.int64)[order].tobytes(),
            g["tf"].to_numpy(np.int32)[order].tobytes(),
            g["dl"].to_numpy(np.int32)[order].tobytes(),
            g["imp"].to_numpy(np.int32)[order].tobytes(),
        ))
    return pd.DataFrame(out, columns=["shard", "term", "salt", "n",
                                      "doc_ids", "tfs", "dls", "imps"])


def _make_encode_group(avgdl: float, bm25: BM25Config, cfg: IndexConfig):
    def encode_group(pdf: pd.DataFrame):
        shard = int(pdf["shard"].iloc[0])
        rows = []
        for term, g in pdf.groupby("term", sort=False):
            doc_ids = np.concatenate([
                np.frombuffer(b, np.int64) for b in g["doc_ids"]])
            tfs = np.concatenate([np.frombuffer(b, np.int32) for b in g["tfs"]])
            dls = np.concatenate([np.frombuffer(b, np.int32) for b in g["dls"]])
            imps = np.concatenate([np.frombuffer(b, np.int32) for b in g["imps"]])
            # merge the S sorted salted runs (doc_ids are globally unique
            # per term, so a stable argsort over the concat is an exact
            # merge; SURVEY.md §7.2 #3)
            order = np.argsort(doc_ids, kind="stable")
            doc_ids = doc_ids[order]
            df_shard = len(doc_ids)
            for c in encode_chunks(
                doc_ids, tfs[order], dls[order], imps[order],
                avgdl=avgdl, k1=bm25.k1, b=bm25.b,
                block_size=cfg.block_size, chunk_blocks=cfg.chunk_blocks,
            ):
                rows.append((shard, term, c["chunk"], df_shard,
                             c["n_postings"], c["first_doc"], c["last_doc"],
                             c["payload"], c["block_last_doc"],
                             c["block_max_score"], c["block_max_wscore"]))
        return pd.DataFrame(rows, columns=[f.name for f in INDEX.fields])

    return encode_group


def build_compressed_index(postings: DataFrame, avgdl: float,
                           bm25: BM25Config = BM25Config(),
                           cfg: IndexConfig = IndexConfig()) -> DataFrame:
    """postings (term, doc_id, tf, imp, dl) -> INDEX DataFrame."""
    keyed = _with_keys(postings, cfg)
    runs = keyed.groupBy("shard", "tb", "salt").applyInPandas(
        _pack_runs, schema=SALTED_RUNS
    )
    runs = runs.withColumn(
        "tb", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int")
    )
    return runs.groupBy("shard", "tb").applyInPandas(
        _make_encode_group(avgdl, bm25, cfg), schema=INDEX
    )

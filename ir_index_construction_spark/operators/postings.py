"""Tokenization + posting construction + corpus statistics.

Covers SURVEY.md §2 O6-O12 (fused UDF + native explode) and O21 (stats).
The merge stage of the reference (O13-O15, merger.py:31-102) does not
exist here: Spark's shuffle IS the k-way sorted merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from ..functions.udfs import make_extract_tokenize
from ..schemas import TOKENIZED, TOKENIZED_POS


def tokenize(corpus_with_ids: DataFrame, positions: bool = False) -> DataFrame:
    """(doc_id, url, html, ...) -> TOKENIZED minus the ``text`` column
    (one row per doc, per-doc aggregated term stats).  Column pruning:
    only doc_id/url/html cross into Python.  positions=True emits the
    TOKENIZED_POS shape (each term entry also carries its kept-token
    ordinals) — tf/imp/dl are bit-identical either way, so downstream
    postings/docs don't care which ran.

    Round 6: the extracted full text is neither computed nor emitted —
    no consumer of this path (builder tokenize stage, streaming
    micro-batches, positional builds) reads it, and producing it cost a
    full extra tree traversal + string join per document plus the Arrow
    transfer and cache bytes of the page-sized strings (the north-rule
    ``text`` invariant column is produced by ``extract_text_udf``
    separately)."""
    base = TOKENIZED_POS if positions else TOKENIZED
    schema = StructType([f for f in base.fields if f.name != "text"])
    return corpus_with_ids.select("doc_id", "url", "html").mapInPandas(
        make_extract_tokenize(emit_text=False, emit_positions=positions),
        schema=schema,
    )


def tokenize_corpus(cleaned: DataFrame) -> DataFrame:
    """Pre-id tokenization: (url, warc_ts, html, ...) ->
    (url, warc_ts, dl, terms).  The batch build's hot path (SURVEY.md
    §3.1): extraction runs BEFORE the dedup/id shuffle so the html
    column is read once from parquet and never shuffled or cached, and
    the extracted full text never crosses Arrow (emit_text=False) — the
    downstream shuffle carries per-doc term stats, typically 5-10x
    smaller than the raw page.  Duplicate urls (<~5% of a crawl) are
    extracted redundantly and dropped by the dedup pass after — cheaper
    than shuffling every page's html to dedup first."""
    out_schema = StructType(
        [StructField("url", StringType(), False),
         StructField("warc_ts", TimestampType(), False)]
        + [f for f in TOKENIZED.fields if f.name in ("dl", "terms")])
    return cleaned.select("url", "warc_ts", "html").mapInPandas(
        make_extract_tokenize(passthrough=("url", "warc_ts"),
                              emit_text=False),
        schema=out_schema,
    )


def postings_from_tokenized(tokenized: DataFrame) -> DataFrame:
    """Explode per-doc term arrays into flat POSTINGS rows.  Native
    Generate node — no Python.  (term, doc_id) is already unique because
    the UDF pre-aggregated per doc, so NO groupBy/shuffle is needed here
    (the reference's O12 agg happened inside the fused UDF)."""
    return tokenized.select(
        F.col("doc_id"),
        F.col("dl"),
        F.explode("terms").alias("t"),
    ).select(
        F.col("t.term").alias("term"),
        "doc_id",
        F.col("t.tf").alias("tf"),
        F.col("t.imp").alias("imp"),
        "dl",
    )


def positions_from_tokenized(tokenized_pos: DataFrame) -> DataFrame:
    """Explode a TOKENIZED_POS frame into the POSITIONS_TABLE layout:
    (term, doc_id, positions).  Native Generate node; position lists
    stay nested (parquet list<int32> is the compression layer)."""
    return tokenized_pos.select(
        F.col("doc_id"), F.explode("terms").alias("t")
    ).select(
        F.col("t.term").alias("term"),
        "doc_id",
        F.col("t.pos").alias("positions"),
    )


def docs_table(tokenized: DataFrame) -> DataFrame:
    """docs(doc_id, url, doc_len) — includes zero-token docs (the
    reference assigns ids before parsing, indexer.py:164-175, so empty
    docs still count toward N)."""
    return tokenized.select(
        "doc_id", "url", F.col("dl").alias("doc_len")
    )


def dictionary_table(postings: DataFrame) -> DataFrame:
    """dictionary(term, df, cf) — exact df (BM25 identity needs exact
    counts, SURVEY.md O21).  One partial+final hash agg."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def stats_table(docs: DataFrame) -> DataFrame:
    """stats(n_docs, avgdl, n_terms=placeholder until dictionary counted)."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("avgdl"),
    )

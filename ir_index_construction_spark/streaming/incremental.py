"""Incremental index maintenance from a document stream.

``readStream`` over a directory of corpus parquet files -> the same
fused extract+tokenize pass as the batch build -> ``foreachBatch``
appends postings/docs snapshots to the catalog.  Trigger
``availableNow`` drains everything present and stops — the pattern a
periodic crawl-refresh job uses.

Ids for streamed docs are allocated per micro-batch above a base offset
(batch-local url rank + high bits of the batch id), so they never
collide with the batch build's dense ids; a full rebuild re-densifies.
Late/duplicate urls are dropped against the existing docs table via a
left-anti join before tokenization.  The url rank is the same
range-partitioned dedup+rank pass the batch build uses
(operators/corpus.py) — no single-task global window even when a
micro-batch is a backlog drain of millions of pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.corpus import dedup_assign_ids, defrag_and_filter
from ..operators.postings import docs_table, postings_from_tokenized, tokenize
from ..schemas import DOCUMENTS
from ..sources.catalog import Catalog

BATCH_ID_BASE = 1 << 40


def incremental_index_update(spark: SparkSession, catalog: Catalog,
                             input_dir: str, checkpoint_dir: str):
    """Drain new corpus files from input_dir into postings/docs.
    Returns the finished StreamingQuery (availableNow trigger)."""

    def process_batch(batch_df: DataFrame, batch_id: int):
        cleaned = defrag_and_filter(batch_df)
        if catalog.table_exists("docs"):
            existing = catalog.read(spark, "docs").select("url")
            cleaned = cleaned.join(existing, "url", "left_anti")
        base = BATCH_ID_BASE * (batch_id + 1)
        # first-occurrence dedup + dense batch-local url rank in ONE
        # range-partition shuffle (sort key (url, warc_ts, html) = the
        # window path's deterministic survivor), offset into this
        # micro-batch's id space
        ranked, handle = dedup_assign_ids(cleaned, ["url", "warc_ts", "html"])
        with_ids = ranked.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(base)).cast("long"))
        tok = tokenize(with_ids).persist()
        try:
            if tok.limit(1).count() == 0:
                return
            catalog.append(postings_from_tokenized(tok), "postings")
            catalog.append(docs_table(tok), "docs")
        finally:
            tok.unpersist()
            handle.unpersist()

    stream = (
        spark.readStream.schema(DOCUMENTS).parquet(input_dir)
    )
    query = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query

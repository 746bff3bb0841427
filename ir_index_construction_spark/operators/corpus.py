"""Corpus ingest: defrag -> validity filter -> dedup -> dense doc ids.

Covers SURVEY.md §2 O1-O5.  Everything except the urllib defrag is native
Catalyst (whole-stage-codegen'd filters, window dedup); the dense id
assignment is the scalable two-pass offset scheme — no single-partition
global sort, no driver collect of data rows (only one small count per
partition reaches the driver).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import url_parts_udf
from ..text.normalize import EXT_BLACKLIST_PATTERN


def clean_corpus(documents: DataFrame) -> DataFrame:
    """defrag + is_valid_url + first-occurrence dedup (indexer.py:95-158).

    Returns (url, warc_ts, html, text, lang) with url defragmented,
    invalid urls dropped, and exactly one row per url (earliest warc_ts
    wins — the reference's walk-order-first rule, indexer.py:153-154).
    """
    parts = documents.withColumn("_p", url_parts_udf(F.col("url")))
    cleaned = (
        parts
        .withColumn("url", F.col("_p.url"))
        # '...=txt' rejection: split('=')[-1] == 'txt' (indexer.py:130-132)
        .filter(F.element_at(F.split(F.col("url"), "="), -1) != "txt")
        .filter(F.col("_p.scheme").isin("http", "https"))
        # blacklist matched with re.match semantics == rlike '^...' anchor
        .filter(~F.col("_p.path").rlike("^" + EXT_BLACKLIST_PATTERN))
        .drop("_p")
    )
    # First occurrence per url; warc_ts then html as a total tie-break so
    # the choice is deterministic even for exact-timestamp duplicates.
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(F.col("warc_ts").asc(), F.col("html").asc())
    return (
        cleaned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_doc_ids(df: DataFrame, id_partitions: int | None = None) -> DataFrame:
    """Deterministic dense doc_id = global rank of url (SURVEY.md §4.3).

    Scale design: a global row_number() would sort through ONE task.
    Instead: range-partition by url, sort within partitions, persist to
    freeze the (sampled, hence otherwise nondeterministic) range
    boundaries, count rows per partition (tiny driver collect), then add
    cumulative offsets in an Arrow pass.  The resulting id depends only
    on the url ordering, not on the partition boundaries, so it is
    stable across runs and cluster sizes.

    The returned DataFrame is persisted; caller owns unpersist.
    """
    spark = df.sparkSession
    if id_partitions is None:
        id_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)

    part = (
        df.repartitionByRange(id_partitions, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["n"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = df.schema.add("doc_id", "long", False)

    def attach(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = bc.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(base + local, base + local + len(pdf),
                                      dtype=np.int64)
            local += len(pdf)
            yield pdf

    return part.mapInPandas(attach, schema=out_schema), part


def ingest(documents: DataFrame) -> tuple:
    """Full O1-O5 chain. Returns (with_ids, persisted_handle)."""
    return assign_doc_ids(clean_corpus(documents))

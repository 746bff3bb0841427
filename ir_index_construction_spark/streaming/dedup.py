"""Streaming exact deduplication over a document stream.

The batch twin is ``operators.dedup.exact_duplicates`` / the
first-occurrence-wins corpus dedup (O4, driver q03/q11); this runs the
same "keep the first copy of each text" rule incrementally:
``dropDuplicatesWithinWatermark`` on the md5 of the text keeps state
only for keys whose event time is still within the watermark horizon,
so state is bounded by (arrival rate x horizon) instead of growing with
the stream — the property that makes exact dedup runnable on an
unbounded crawl.

Semantics note (and why the horizon is a parameter): a duplicate
arriving AFTER its original has aged past the horizon is re-emitted.
That is the standard streaming trade — exactness within the horizon,
re-admission beyond it; a downstream batch `exact_duplicates` sweep
over the sink (the batch twin) reconciles long-range dups, which is
how crawl pipelines actually layer the two.

``availableNow`` drains whatever is in the input directory and stops;
the dedup state and watermark persist in the checkpoint between runs,
so re-running on replayed input re-emits nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import DOCUMENTS


def streaming_dedup_docs(spark: SparkSession, input_dir: str,
                         checkpoint_dir: str, output_dir: str,
                         horizon: str = "1 hour") -> DataFrame:
    """Drain input_dir; emit each distinct text's FIRST arrival to an
    append parquet sink.  Returns a DataFrame over output_dir = every
    doc emitted so far across runs."""
    stream = (spark.readStream.schema(DOCUMENTS).parquet(input_dir)
              .withColumn("ts", F.col("warc_ts").cast("timestamp")))
    deduped = (
        stream
        .withColumn("text_key", F.md5(F.col("text")))
        .withWatermark("ts", horizon)
        .dropDuplicatesWithinWatermark(["text_key"])
        .drop("ts")
    )
    q = (
        deduped.writeStream.outputMode("append").format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(deduped.schema).parquet(output_dir)

"""Watermarked windowed aggregation over an event stream.

The batch twin is ``operators.events.windowed_event_counts`` (driver
query q31); this runs the SAME logical plan incrementally with
Structured Streaming's append mode: a tumbling window is emitted
exactly once, when the watermark (max seen event time minus the
allowed lateness) passes its end — late events inside the lateness
bound still land in their window, later ones are dropped.  State is
bounded by (windows in flight x event types), not by the stream.

``availableNow`` drains whatever is in the input directory and stops —
run it periodically and each run emits the windows the new data closed
(the watermark persists in the checkpoint between runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import EVENTS


def streaming_windowed_counts(spark: SparkSession, input_dir: str,
                              checkpoint_dir: str, output_dir: str,
                              lateness: str = "10 minutes",
                              window: str = "1 hour") -> DataFrame:
    """Drain input_dir; append-mode parquet sink (the memory sink can't
    recover from a checkpoint, and a file/table sink is what production
    runs anyway).  Returns a DataFrame over output_dir = ALL windows
    emitted so far across runs — each window appears exactly once."""
    # watermarks require TIMESTAMP (not NTZ); the cast is identity under
    # the engine's fixed UTC session timezone
    stream = (spark.readStream.schema(EVENTS).parquet(input_dir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (
        stream.withWatermark("ts", lateness)
        .groupBy(F.window(F.col("ts"), window).alias("w"),
                 F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )
    q = (
        agg.writeStream.outputMode("append").format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(agg.schema).parquet(output_dir)

"""Streaming exact deduplication over a document stream.

The batch twin is ``operators.dedup.exact_duplicates`` / the
first-occurrence-wins corpus dedup (O4, driver q03/q11); this runs the
same "keep the first copy of each text" rule incrementally as a custom
stateful operator (``applyInPandasWithState`` keyed on md5(text)).

Why not ``dropDuplicatesWithinWatermark``: it keeps the first row it
PROCESSES per key, which within a micro-batch is partition-order
nondeterministic (and streaming DataFrames cannot be sorted to pin it).
Here the batch's copies of a key meet in ONE stateful group, so the
survivor is the deterministic first ARRIVAL — min (warc_ts, url) —
matching the batch twin's deterministic-survivor rule.  Across
micro-batches the first batch containing the key wins, exactly as the
built-in operator behaves; duplicates in later batches are suppressed
while the key's state lives.

State per key is two longs (last-seen event time; the emitted flag is
the state's existence), expired by an event-time timeout ``horizon``
past the last sighting — so state is bounded by (arrival rate x
horizon) instead of growing with the stream, the property that makes
exact dedup runnable on an unbounded crawl.

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

import re
from typing import Any, Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..schemas import DOCUMENTS

_DEDUP_STATE = StructType([StructField("last_seen_us", LongType(), False)])

_UNIT_MS = {"second": 1000, "minute": 60_000, "hour": 3_600_000,
            "day": 86_400_000}


def _horizon_ms(horizon: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", horizon)
    if not m:
        raise ValueError(f"unparseable horizon {horizon!r}")
    return int(m.group(1)) * _UNIT_MS[m.group(2)]


def _make_dedup_fn(horizon: str):
    h_ms = _horizon_ms(horizon)

    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()                 # key ages out past the horizon
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        last_us = int(ts_us.max())
        if state.exists:
            last_us = max(last_us, int(state.get[0]))   # dup: suppress
        else:
            # first sighting of this key: emit the deterministic first
            # arrival among the batch's copies — min (ts, url)
            win = batch.assign(_us=ts_us).sort_values(["_us", "url"]) \
                .iloc[[0]].drop(columns=["_us", "ts", "text_key"])
            yield win
        state.update((last_us,))
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + h_ms, wm_ms + 1))

    return fn


def streaming_dedup_docs(spark: SparkSession, input_dir: str,
                         checkpoint_dir: str, output_dir: str,
                         horizon: str = "1 hour") -> DataFrame:
    """Drain input_dir; emit each distinct text's FIRST arrival (min
    (warc_ts, url) in its first batch) to an append parquet sink.
    Returns a DataFrame over output_dir = every doc emitted so far
    across runs."""
    stream = (spark.readStream.schema(DOCUMENTS).parquet(input_dir)
              .withColumn("ts", F.col("warc_ts").cast("timestamp")))
    deduped = (
        stream
        .withColumn("text_key", F.md5(F.col("text")))
        .withWatermark("ts", horizon)
        .groupBy("text_key")
        .applyInPandasWithState(
            _make_dedup_fn(horizon),
            outputStructType=DOCUMENTS,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        deduped.writeStream.outputMode("append").format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(DOCUMENTS).parquet(output_dir)

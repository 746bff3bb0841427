"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

Batch twin: ``operators.events.session_stats`` (driver query q32).
Here the per-user session is STATE carried across micro-batches:

  state       (session_start, last_ts, n_events) for the open session
  in-batch    events extend the session while the gap <= gap_minutes;
              a larger gap EMITS the closed session and opens a new one
  timeout     an event-time timeout at last_ts + gap fires when the
              WATERMARK passes it — the open session is emitted and the
              state cleared, so idle users' sessions close without
              waiting for their next event, and state stays bounded by
              the number of currently-active users

Arrow-batched throughout (one pandas frame per user per batch — no
per-row Python), keyed shuffle on user_id only.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType, TimestampType)

from ..schemas import EVENTS

SESSION_OUT = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", IntegerType(), False),
])

# state: epoch-micros start/last + count (plain longs — Arrow-friendly)
SESSION_STATE = StructType([
    StructField("start_us", LongType(), False),
    StructField("last_us", LongType(), False),
    StructField("n", IntegerType(), False),
])


def _make_session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list = []

        def emit(start_us: int, last_us: int, n: int):
            closed.append((user_id, pd.Timestamp(start_us, unit="us"),
                           pd.Timestamp(last_us, unit="us"), n))

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is over
            start_us, last_us, n = state.get
            emit(start_us, last_us, n)
            state.remove()
        else:
            ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
            # Arrow hands timestamps as datetime64[ns] or [us] depending
            # on the pandas/pyarrow pairing — normalize to micros
            ts_us = ts.to_numpy().astype("datetime64[us]").astype("int64")
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = int(ts_us[0])
                n = 0
                ts_us = ts_us  # first event still counted below
            for t in ts_us:
                t = int(t)
                if n > 0 and t - last_us > gap_us:
                    emit(start_us, last_us, n)
                    start_us, n = t, 0
                last_us = max(last_us, t)
                n += 1
            state.update((start_us, last_us, n))
            # fire when the watermark passes the open session's close
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start",
                                 "session_end", "n_events"])

    return fn


def streaming_sessionize(spark: SparkSession, input_dir: str,
                         checkpoint_dir: str, output_dir: str,
                         gap_minutes: int = 30,
                         lateness: str = "10 minutes") -> DataFrame:
    """Drain input_dir (availableNow); append closed sessions to the
    parquet sink.  Returns a DataFrame over output_dir = all sessions
    closed so far (each exactly once; open sessions stay in state
    across runs via the checkpoint)."""
    stream = (spark.readStream.schema(EVENTS).parquet(input_dir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    sessions = (
        stream.withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        sessions.writeStream.outputMode("append").format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(SESSION_OUT).parquet(output_dir)

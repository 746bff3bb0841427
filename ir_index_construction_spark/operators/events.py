"""Event-stream analytics operators (engine extension — the reference
is a pure fulltext pipeline with no event/relational surface; these
cover the driver testdata `events` table and the shapes a training-data
pipeline uses for activity logs: windowed rollups and gap-based
sessionization).

All native Catalyst plans:

  windowed_event_counts   tumbling-window count/sum per event type —
                          one hash aggregation, window start is a
                          deterministic function of ts (epoch-aligned)
  sessionize              gap-based sessions via lag + running sum over
                          a user-partitioned window — distributes by
                          user key, never a global window
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _epoch(c: Column) -> Column:
    """Seconds since epoch.  TIMESTAMP_NTZ won't cast straight to long
    in Spark 4; route through TIMESTAMP (identity under the engine's
    fixed UTC session timezone)."""
    return c.cast("timestamp").cast("long")


def windowed_event_counts(df: DataFrame, ts_col: str = "ts",
                          type_col: str = "event_type",
                          value_col: str = "value",
                          window: str = "1 hour") -> DataFrame:
    """Tumbling-window rollup: (window_start, event_type, n_events,
    sum_value).  At stream scale this is the same logical plan
    Structured Streaming runs incrementally (streaming/windows.py)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"),
                   F.col(type_col).alias("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(value_col), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "sum_value")
    )


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_minutes: int = 30) -> DataFrame:
    """Assign gap-based session ids: a user's new session starts when
    the gap to their previous event exceeds ``gap_minutes``.  Plan:
    lag -> boundary flag -> running sum, all over the SAME
    user-partitioned window (one shuffle on user_col; each user's
    events sort within their partition — no global sort).  ``id_col``
    breaks timestamp ties so the lag order, and therefore the session
    assignment, is deterministic."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap = (_epoch(F.col(ts_col))
           - _epoch(F.lag(F.col(ts_col)).over(w)))
    boundary = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        df.withColumn("_b", boundary)
        .withColumn("session_id", F.sum("_b").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .drop("_b")
    )


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup over sessionize(): (user_id, session_id,
    n_events, session_start, duration_sec)."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    return (
        s.groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(F.count("*").alias("n_events"),
             F.min(ts_col).alias("session_start"),
             (_epoch(F.max(F.col(ts_col)))
              - _epoch(F.min(F.col(ts_col)))).alias("duration_sec"))
    )

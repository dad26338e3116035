"""Temporal operators (reference graph/temporal.rs:120-380 re-expressed).

The reference's TemporalGraph holds edges with valid-from/to timestamps
and answers snapshot / evolution queries by scanning; on Spark a snapshot
is a partition-pruned filter and evolution metrics are windowed aggs.

Also the event-stream operators a transcript/training pipeline needs:
tumbling-window rollups and gap-based sessionization — both pure window
functions (and 1:1 portable to Structured Streaming with watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def snapshot(edges: DataFrame, at_ts, ts_from: str = "valid_from",
             ts_to: str = "valid_to") -> DataFrame:
    """Edges alive at `at_ts` (graph/temporal.rs snapshot_at)."""
    return edges.filter(
        (F.col(ts_from) <= F.lit(at_ts))
        & (F.col(ts_to).isNull() | (F.col(ts_to) > F.lit(at_ts))))


def tumbling_rollup(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    value_col: str = "value",
                    width: str = "1 hour") -> DataFrame:
    """→ (window_start, key, n_events, sum_value, avg_value) per bucket."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), width).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "key",
                "n_events", "sum_value", "avg_value")
    )


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions: → (user_id, session_id, n_events,
    session_start, session_end).

    session_id = cumulative count of gap-breaks per user (0-based),
    computed with lag + a running sum — two windows, one shuffle.
    """
    gap = F.lit(gap_minutes * 60)
    # NTZ timestamps need an explicit hop through timestamp for epoch secs
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    with_break = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.when(
            epoch - F.lag(epoch).over(
                Window.partitionBy(user_col).orderBy(ts_col)) > gap,
            1).otherwise(0).alias("brk"),
    )
    w_run = Window.partitionBy("user_id").orderBy("ts") \
        .rowsBetween(Window.unboundedPreceding, 0)
    sess = with_break.withColumn("session_id",
                                 F.sum("brk").over(w_run).cast("bigint"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def node_activity(edges_ts: DataFrame, bucket: str = "1 day") -> DataFrame:
    """Temporal degree: per (node, time-bucket) edge count — the
    evolution/churn primitive of graph/temporal.rs:220-380."""
    ends = edges_ts.select(F.col("src").alias("node"), "ts").union(
        edges_ts.select(F.col("dst").alias("node"), "ts"))
    return (
        ends.groupBy(F.window("ts", bucket).alias("w"), "node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("w.start").alias("bucket_start"), "node", "degree")
    )

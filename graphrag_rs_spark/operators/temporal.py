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


# ---------------------------------------------------------------------
# Evolution analytics (graph/temporal.rs:260-395 TemporalAnalytics).
# Temporal edges: (src, dst, ts) with optional (start_time, end_time)
# interval validity — all epoch-second longs.  An edge is active at t
# when start<=t<=end (interval) or ts==t (point, temporal.rs:42-50);
# active in [a, b] when it overlaps (point: a<=ts<=b, rs:52-62).
# Buckets are the reference's loop `while t <= end: [t, t+granularity]`
# — INCLUSIVE both ends, so boundary edges land in two buckets; the
# bucket-index arithmetic below reproduces that exactly.
# ---------------------------------------------------------------------


def _interval(edges: DataFrame):
    s = F.col("start_time") if "start_time" in edges.columns else F.col("ts")
    e = F.col("end_time") if "end_time" in edges.columns else F.col("ts")
    return F.coalesce(s, F.col("ts")), F.coalesce(e, F.col("ts"))


def _n_buckets(start: int, end: int, granularity: int) -> int:
    return (end - start) // granularity + 1


def _bucketed_edges(edges: DataFrame, start: int, end: int,
                    granularity: int) -> DataFrame:
    """→ (bucket, src, dst): one row per (edge, bucket) where the edge is
    active in [start + bucket·g, start + bucket·g + g].  Pure Catalyst:
    the index range per edge is closed-form, then sequence+explode —
    each edge fans out to O(active buckets), never a cross join."""
    es, ee = _interval(edges)
    g = F.lit(int(granularity))
    nb = _n_buckets(start, end, granularity)
    # overlap([es, ee], [b, b+g]) ⇔ es ≤ b+g ∧ ee ≥ b
    #   ⇔ i ∈ [ceil((es-start)/g) - 1, floor((ee-start)/g)]
    i_lo = F.greatest(
        F.floor((es - F.lit(start) + g - 1) / g).cast("long") - 1, F.lit(0))
    i_hi = F.least(F.floor((ee - F.lit(start)) / g).cast("long"),
                   F.lit(nb - 1))
    return (
        edges.select("src", "dst", i_lo.alias("_lo"), i_hi.alias("_hi"))
        .filter(F.col("_lo") <= F.col("_hi"))
        .select("src", "dst",
                F.explode(F.sequence("_lo", "_hi")).alias("bucket"))
    )


def evolution_metrics(edges: DataFrame, start: int, end: int,
                      granularity: int) -> DataFrame:
    """temporal.rs:271-307 evolution_metrics: per bucket →
    (timestamp, node_count, edge_count, density, avg_degree); every
    bucket in [start, end] is emitted, empty ones as zeros.

    density = edges / (n·(n-1)/2); avg_degree = Σ node_degree / n where
    an edge contributes once per DISTINCT endpoint (a self-loop adds 1,
    not 2 — node_degree counts edges, temporal.rs:101-107)."""
    spark = edges.sparkSession
    nb = _n_buckets(start, end, granularity)
    # eager checkpoint, not persist: the returned plan scans `be` twice
    # and a build-time unpersist would uncache it before evaluation,
    # while a leaked persist pins CacheManager entries per call —
    # checkpointed blocks free themselves when the frame is GC'd
    be = _bucketed_edges(edges, start, end, granularity) \
        .localCheckpoint(eager=True)
    per_edge = be.groupBy("bucket").agg(F.count(F.lit(1)).alias("edge_count"))
    ends = be.select(
        "bucket", F.explode(F.array_distinct(F.array("src", "dst")))
        .alias("node"))
    per_node = ends.groupBy("bucket").agg(
        F.countDistinct("node").alias("node_count"),
        F.count(F.lit(1)).alias("total_degree"))
    spine = spark.range(nb).select(F.col("id").alias("bucket"))
    out = (
        spine.join(per_edge, "bucket", "left")
        .join(per_node, "bucket", "left")
        .select(
            (F.lit(start) + F.col("bucket") * granularity)
            .alias("timestamp"),
            F.coalesce("node_count", F.lit(0)).alias("node_count"),
            F.coalesce("edge_count", F.lit(0)).alias("edge_count"),
            F.round(F.when(
                F.coalesce("node_count", F.lit(0)) < 2, 0.0).otherwise(
                F.col("edge_count")
                / (F.col("node_count") * (F.col("node_count") - 1) / 2.0)),
                6).alias("density"),
            F.round(F.when(
                F.coalesce("node_count", F.lit(0)) == 0, 0.0).otherwise(
                F.col("total_degree") / F.col("node_count")),
                6).alias("avg_degree"),
        )
    )
    return out


def node_churn(edges: DataFrame, start_ts: int, end_ts: int) -> DataFrame:
    """temporal.rs:310-345 node_churn between the POINT snapshots at
    start_ts and end_ts → (node, status ∈ added|removed|stable)."""
    es, ee = _interval(edges)

    def nodes_at(t: int) -> DataFrame:
        alive = edges.filter((es <= F.lit(t)) & (ee >= F.lit(t)))
        return alive.select(F.col("src").alias("node")).union(
            alive.select(F.col("dst").alias("node"))).distinct()

    a, b = nodes_at(start_ts), nodes_at(end_ts)
    stable = a.join(b, "node", "left_semi") \
        .withColumn("status", F.lit("stable"))
    added = b.join(a, "node", "left_anti").withColumn("status", F.lit("added"))
    removed = a.join(b, "node", "left_anti") \
        .withColumn("status", F.lit("removed"))
    return stable.unionByName(added).unionByName(removed)


def top_growing_nodes(edges: DataFrame, start: int, end: int,
                      granularity: int, top_k: int = 10) -> DataFrame:
    """temporal.rs:347-371: degree growth between the FIRST bucket
    [start, start+g] and the LAST [end-g, end], over the last bucket's
    nodes; growth = (end-start)/start, or end_degree when the node is
    absent at the start.  → (node, growth), top_k by growth desc.

    The reference's sort is score-only (tie order = Rust sort
    nondeterminism); we round to 6dp and break ties by node asc —
    deterministic, same set for distinct scores."""
    es, ee = _interval(edges)

    def window_edges(a: int, b: int) -> DataFrame:
        return edges.filter((es <= F.lit(b)) & (ee >= F.lit(a)))

    def degrees(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(F.array_distinct(F.array("src", "dst")))
                      .alias("node"))
            .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
        )

    d0 = degrees(window_edges(start, start + granularity))
    d1 = degrees(window_edges(end - granularity, end))
    growth = F.when(F.coalesce("d0.deg", F.lit(0)) > 0,
                    (F.col("d1.deg") - F.col("d0.deg"))
                    / F.col("d0.deg").cast("double")) \
        .otherwise(F.col("d1.deg").cast("double"))
    return (
        d1.alias("d1").join(d0.alias("d0"), "node", "left")
        .select("node", F.round(growth, 6).alias("growth"))
        .orderBy(F.col("growth").desc(), F.col("node").asc())
        .limit(top_k)
    )


def temporal_centrality(edges: DataFrame, node: str, start: int, end: int,
                        granularity: int) -> DataFrame:
    """temporal.rs:373-395: per bucket, degree(node) / (node_count - 1)
    (0 when the bucket has ≤ 1 node) → (timestamp, centrality)."""
    spark = edges.sparkSession
    nb = _n_buckets(start, end, granularity)
    # eager checkpoint, not persist — same rationale as evolution_metrics
    be = _bucketed_edges(edges, start, end, granularity) \
        .localCheckpoint(eager=True)
    ends = be.select(
        "bucket", F.explode(F.array_distinct(F.array("src", "dst")))
        .alias("node"))
    per_bucket = ends.groupBy("bucket").agg(
        F.countDistinct("node").alias("node_count"),
        F.sum(F.when(F.col("node") == node, 1).otherwise(0)).alias("deg"))
    spine = spark.range(nb).select(F.col("id").alias("bucket"))
    return (
        spine.join(per_bucket, "bucket", "left")
        .select(
            (F.lit(start) + F.col("bucket") * granularity)
            .alias("timestamp"),
            F.round(F.when(
                F.coalesce("node_count", F.lit(0)) <= 1, 0.0).otherwise(
                F.coalesce("deg", F.lit(0))
                / (F.col("node_count") - 1.0)), 6).alias("centrality"),
        )
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

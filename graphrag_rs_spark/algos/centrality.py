"""Closeness and betweenness centrality as distributed Brandes passes.

Reference parity: graph/analytics.rs:182-267 (`calculate_centrality`)
returns degree + betweenness + closeness per node.  The reference's
betweenness is the "simplified" variant — for every ordered pair it asks
whether THE one shortest path returned by its Dijkstra contains v, so
its value depends on Dijkstra's tie order.  That is not a semantics a
distributed engine should replicate; this module implements the
literature-standard Brandes (2001) formulation instead, which counts ALL
shortest paths fractionally (sigma path counts + dependency
accumulation).  On graphs whose shortest paths are unique the two agree
exactly (up to the reference's own ordered-pair double count, folded
into the normalization below); on tie-heavy graphs ours is the
well-defined limit.  Documented divergence, same spirit as
shortest_path_length (length-only vs path-object).

Scale posture (the 100 TB story):
- Exact all-sources Brandes is O(n·m) — no engine runs that at web
  scale.  Both operators take an explicit `sources` frame and compute
  EXACT per-source passes from that set; callers sample sources
  (Brandes & Pich 2007) and the betweenness estimator rescales by
  n/|sources|.  Closeness from a source set is not an estimate at all:
  it is the exact (depth-capped) closeness OF those nodes.
- Every pass is the bfs_from_each frontier-join shape: state keyed by
  (source, node) so k sources cost the same number of shuffles as one;
  one shuffle per depth, lineage cut per round (localCheckpoint), depth
  bounded (TraversalConfig semantics — unbounded traversal at web scale
  is a bug).
- sigma path counts are exact BIGINTs; dependency deltas are BIGINT
  micro-units (1e-6) with every per-edge contribution rounded before
  accumulation, so every sum in the recurrence is an exact integer sum
  — independent of float summation order and replayed bit-for-bit by
  the DuckDB oracle (repo invariant: round before downstream use).

Self-loops are dropped and the edge set is deduplicated before any
pass — duplicate (src,dst) rows would double-count sigma.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _clean_edges(edges: DataFrame, directed: bool) -> DataFrame:
    e = edges.select("src", "dst")
    if not directed:
        e = e.union(edges.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
    return e.filter(F.col("src") != F.col("dst")).distinct()


def brandes_forward(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    directed: bool = False,
) -> DataFrame:
    """→ (source, node, dist, sigma): per-source BFS distances plus the
    EXACT count of shortest s→node paths (Brandes' sigma, bigint).

    A node first reached at depth d has all its shortest-path
    predecessors at depth d-1, so sigma(d) = sum of parent sigmas — one
    groupBy per round, before the visited anti-join."""
    e = _clean_edges(edges, directed).persist()
    visited = (sources.select("node").distinct()
               .withColumn("source", F.col("node"))
               .withColumn("dist", F.lit(0))
               .withColumn("sigma", F.lit(1).cast("bigint"))
               .select("source", "node", "dist", "sigma")
               .localCheckpoint(eager=True))
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("source", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("source", "node"), ["source", "node"],
                  "left_anti")
            .withColumn("dist", F.lit(depth))
            .select("source", "node", "dist", "sigma")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        # lazy union of checkpointed parts: re-checkpointing the
        # growing union re-serializes every earlier level per depth
        # (O(depth²) write amplification)
        visited = visited.union(nxt)
        frontier = nxt
    e.unpersist()
    return visited


def closeness_centrality(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    directed: bool = False,
) -> DataFrame:
    """→ (node, reachable, total_dist, closeness): the reference's
    closeness formula (analytics.rs:249-267) — reachable / sum(dist),
    0.0 when nothing is reachable — computed exactly for each node in
    `sources`, over the depth-capped horizon (hop distances; the
    reference sums Dijkstra edge weights, weight≡1 here, same
    length-only divergence as shortest_path_length)."""
    fwd = brandes_forward(edges, sources, max_depth, directed)
    per = fwd.filter(F.col("dist") > 0).groupBy(
        F.col("source").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("reachable"),
        F.sum("dist").cast("bigint").alias("total_dist"))
    return (sources.select("node").distinct()
            .join(per, "node", "left")
            .select(
                "node",
                F.coalesce("reachable", F.lit(0)).alias("reachable"),
                F.coalesce("total_dist", F.lit(0)).alias("total_dist"),
                F.round(
                    F.when(F.coalesce("total_dist", F.lit(0)) > 0,
                           F.col("reachable").cast("double")
                           / F.col("total_dist"))
                    .otherwise(F.lit(0.0)), 6).alias("closeness")))


def betweenness_centrality(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    n_total: int | None = None,
    directed: bool = False,
) -> DataFrame:
    """→ (node, delta_sum, betweenness): Brandes dependency accumulation
    from the given source set.

    delta_sum(v) = Σ_{s∈sources, s≠v} δ_s(v) where δ is the standard
    backward recurrence δ_s(v) = Σ_{w: succ on SP-DAG} σ_v/σ_w·(1+δ_s(w)),
    each level rounded to 6 dp before the level below consumes it.

    betweenness = delta_sum · (n/|sources|) / ((n-1)(n-2)) — the
    sampled-source estimator rescale times the reference's
    fraction-of-pairs normalization (analytics.rs:242-246; its ordered
    double count for undirected graphs is folded in by dividing by the
    full (n-1)(n-2) rather than its half).  Nodes with delta_sum = 0 are
    omitted (they are exactly the non-intermediate nodes).
    """
    fwd = brandes_forward(edges, sources, max_depth, directed)
    fwd = fwd.localCheckpoint(eager=True)
    if n_total is None:
        n_total = fwd.select("node").distinct().count()
    n_sources = sources.select("node").distinct().count()

    e = _clean_edges(edges, directed)
    v = fwd.select("source", F.col("node").alias("v"),
                   F.col("dist").alias("v_dist"),
                   F.col("sigma").alias("v_sigma"))
    w = fwd.select("source", F.col("node").alias("w"),
                   F.col("dist").alias("w_dist"),
                   F.col("sigma").alias("w_sigma"))
    # shortest-path DAG: edge v→w belongs iff dist(w) = dist(v)+1
    dag = (v.join(e, v["v"] == e["src"])
           .join(w, (w["source"] == v["source"]) & (w["w"] == e["dst"]))
           .filter(F.col("w_dist") == F.col("v_dist") + 1)
           .select(v["source"], "v", "v_dist", "v_sigma", "w", "w_sigma")
           .localCheckpoint(eager=True))

    max_d = fwd.agg(F.max("dist")).collect()[0][0] or 0
    # Deltas are BIGINT micro-units (1e-6): every DAG-edge contribution
    # σ_v·(1 + δ_w)/σ_w is rounded to a micro-int BEFORE accumulation,
    # so every sum in the recurrence is an exact integer sum —
    # independent of float summation order, hence hash-identical across
    # engines.  Each summand is one IEEE multiply+divide on exact
    # integers (σ ≤ ~1e4, scaled δ ≤ ~3e7 → products < 2^53, exact).
    # Accuracy cost vs exact Brandes: ≤ 5e-7 per DAG edge, immaterial.
    # Successors of a depth-d node sit exactly at depth d+1, so each
    # backward level joins only the previous level's deltas.
    prev = None      # (source, w, w_du) — the level just above
    deltas = []      # per-level (source, node, du) — each already
    #                  checkpointed; unioned ONCE after the loop (an
    #                  eager checkpoint of the growing union would
    #                  re-serialize level-1 results at every level,
    #                  O(levels²) materialization)
    for d in range(max_d - 1, -1, -1):
        lvl = dag.filter(F.col("v_dist") == d)
        if prev is not None:
            lvl = lvl.join(prev, ["source", "w"], "left")
        else:
            lvl = lvl.withColumn("w_du", F.lit(None).cast("bigint"))
        cur = (lvl.groupBy("source", F.col("v").alias("node"))
               .agg(F.sum(F.round(
                   F.col("v_sigma")
                   * (F.lit(1000000.0) + F.coalesce("w_du", F.lit(0)))
                   / F.col("w_sigma")).cast("bigint")).alias("du"))
               .localCheckpoint(eager=True))
        prev = cur.select("source", F.col("node").alias("w"),
                          F.col("du").alias("w_du"))
        deltas.append(cur)

    delta = None
    for part in deltas:
        delta = part if delta is None else delta.union(part)

    if delta is None:
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], "node string, delta_sum double, betweenness double")

    scale = (float(n_total) / n_sources) \
        / ((n_total - 1) * (n_total - 2)) if n_total > 2 else 0.0
    return (delta.filter(F.col("node") != F.col("source"))
            .groupBy("node")
            .agg(F.sum("du").alias("_du"))
            .filter(F.col("_du") > 0)
            .select(
                "node",
                F.round(F.col("_du") / 1e6, 6).alias("delta_sum"),
                F.round(F.col("_du") / 1e6 * F.lit(scale), 6)
                .alias("betweenness")))

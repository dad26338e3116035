"""Graph traversal as iterative frontier joins (reference graph/traversal.rs).

BFS levels, bounded-depth ego networks, multi-source BFS, and BFS
shortest paths (graph/analytics.rs:281-353) all share one frontier loop:

    frontier ⋈ edges → next frontier \\ visited

Each hop is one shuffle; lineage is cut per hop.  Depth is bounded
(TraversalConfig semantics) — unbounded traversal at web scale is a bug,
not a feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bidir(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    directed: bool = False,
) -> DataFrame:
    """→ (node, level): hop distance from the nearest source (level 0).

    `sources`: DataFrame with column `node`.  Multi-source by nature
    (traversal.rs:322 multi-source BFS = same loop, seeded wider).
    """
    e = (edges.select("src", "dst") if directed else _bidir(edges)) \
        .persist()
    visited = sources.select("node").distinct() \
        .withColumn("level", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth))
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


def ego_network(edges: DataFrame, center: str, radius: int = 2,
                directed: bool = False) -> DataFrame:
    """Edges of the radius-hop neighborhood of `center`
    (traversal.rs:248 ego networks): both endpoints within radius."""
    spark = edges.sparkSession
    # materialize the edge list once: it feeds the BFS (via its own
    # bidir persist) AND the endpoint semi-joins below — without this a
    # caller handing in an expensive edge-building plan (join+distinct)
    # pays for it twice
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    src = spark.createDataFrame([(center,)], "node string")
    reach = bfs_levels(edges, src, max_depth=radius, directed=directed)
    nodes = reach.select("node")
    return (
        edges.join(nodes.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )


def shortest_path_length(edges: DataFrame, source: str, target: str,
                         max_depth: int = 6,
                         directed: bool = False) -> int | None:
    """BFS shortest-path length source→target, None if beyond max_depth
    (graph/analytics.rs:281-353 semantics, length-only)."""
    spark = edges.sparkSession
    src = spark.createDataFrame([(source,)], "node string")
    levels = bfs_levels(edges, src, max_depth=max_depth, directed=directed)
    row = levels.filter(F.col("node") == target).collect()
    return int(row[0]["level"]) if row else None


def multi_source_bfs(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    directed: bool = False,
) -> DataFrame:
    """→ (node, level): min hop distance from ANY source
    (traversal.rs:322-375 multi_source_bfs).  The reference seeds one FIFO
    queue with every source and takes the first-discovery depth, which IS
    the min distance — identical to `bfs_levels` seeded wide; this wrapper
    exists so the reference API maps one-to-one."""
    return bfs_levels(edges, sources, max_depth=max_depth, directed=directed)


def bfs_from_each(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 2,
    directed: bool = False,
) -> DataFrame:
    """→ (source, node, level): per-seed hop distances, all seeds in ONE
    frontier loop (the frontier is keyed by (source, node), so k seeds
    cost the same number of shuffles as one).  Backs
    `query_focused_subgraph`'s per-seed ego semantics."""
    e = (edges.select("src", "dst") if directed else _bidir(edges)) \
        .persist()
    visited = sources.select(F.col("node").alias("source")).distinct() \
        .withColumn("node", F.col("source")) \
        .withColumn("level", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("source", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("source", "node"), ["source", "node"],
                  "left_anti")
            .withColumn("level", F.lit(depth))
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


def query_focused_subgraph(
    edges: DataFrame,
    seeds: DataFrame,
    expansion_hops: int = 2,
    directed: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """G6 query-focused subgraph (traversal.rs:521-573): union of the
    per-seed ego networks, distances = min over seeds.

    → (nodes, sub_edges): nodes = (node, level); sub_edges = (src, dst)
    edges whose endpoints are both within `expansion_hops` of the SAME
    seed (the reference unions per-seed ego EDGE sets — an edge bridging
    two different seeds' balls is excluded unless one ball covers both
    endpoints, hence the per-seed reach, not the pooled one).
    """
    # eager checkpoint, not persist: `reach` feeds both outputs of the
    # returned pair and a per-call persist is never unpersisted (leaked
    # CacheManager entry); checkpointed blocks free on GC
    reach = bfs_from_each(edges, seeds, max_depth=expansion_hops,
                          directed=directed).localCheckpoint(eager=True)
    nodes = reach.groupBy("node").agg(F.min("level").alias("level"))
    per_seed = reach.select("source", "node")
    sub_edges = (
        edges.select("src", "dst")
        .join(per_seed.withColumnRenamed("node", "src"), "src")
        .join(per_seed.withColumnRenamed("node", "dst"),
              ["source", "dst"], "left_semi")
        .select("src", "dst")
        .distinct()
    )
    return nodes, sub_edges


def all_paths(
    edges: DataFrame,
    source: str,
    target: str,
    max_depth: int = 5,
    directed: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """G7 all simple paths source→target with ≤ `max_depth` NODES
    (analytics.rs:355-414 all_paths/dfs_paths semantics: the node-count
    bound, cycle-free via the visited set, weight = sum of edge weights;
    traversal.rs:388-484 find_all_paths is the same search with an
    edge-depth bound).  → (path array<string>, n_nodes int, weight double).

    Distributed as a frontier loop carrying path ARRAYS: each hop is one
    join; cycle check = !array_contains(path, next).  Paths that reach
    the target are harvested, not extended (the reference records and
    returns at `current == end`).  Candidate growth is bounded by
    branching^max_depth — callers keep max_depth small (the reference
    default TraversalConfig.max_depth is 3-6), which is also why there is
    no max_paths cap here: the DFS cap exists to bound a serial recursion,
    not a data-parallel sweep, and which paths it kept was Rust-iteration-
    order nondeterministic (documented divergence).
    """
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    base = edges.select("src", "dst", w.alias("_w"))
    e = base if directed else base.union(
        base.select(F.col("dst").alias("src"),
                    F.col("src").alias("dst"), "_w"))
    e = e.persist()

    frontier = spark.createDataFrame(
        [(source, [source], 0.0)],
        "cur string, path array<string>, weight double")
    hits = []
    for _ in range(max_depth - 1):
        hits.append(frontier.filter(F.col("cur") == target))
        live = frontier.filter(F.col("cur") != target)
        nxt = (
            live.join(e, live["cur"] == e["src"])
            .filter(~F.array_contains("path", F.col("dst")))
            .select(F.col("dst").alias("cur"),
                    F.concat("path", F.array("dst")).alias("path"),
                    (F.col("weight") + F.col("_w")).alias("weight"))
        )
        frontier = nxt.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    hits.append(frontier.filter(F.col("cur") == target))
    out = hits[0]
    for h in hits[1:]:
        out = out.unionByName(h)
    e.unpersist()
    return out.select("path", F.size("path").alias("n_nodes"),
                      F.round("weight", 6).alias("weight"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, degree, in_degree, out_degree) — G8 centrality baseline."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        )
        .withColumn("degree", F.col("in_degree") + F.col("out_degree"))
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient via triangle counting
    (graph/analytics.rs:416-497): 2·triangles / (deg·(deg-1))."""
    # eager checkpoint, not persist+unpersist: the returned plan scans
    # `und` four times (both wedge sides, the closure probe, degrees) and
    # the unpersist below runs at plan-build time — a persisted frame
    # would be uncached again by the time the caller evaluates (same
    # lazy-tail defect as algos/pagerank.py); checkpointed blocks stay
    # until the frame is garbage-collected
    und = _bidir(edges).filter(F.col("src") != F.col("dst")).distinct() \
        .localCheckpoint(eager=True)
    a, b = und.alias("a"), und.alias("b")
    # wedges centered at a.src: (a.src, a.dst) + (a.src=b.src, b.dst)
    wedges = a.join(b, (F.col("a.src") == F.col("b.src"))
                    & (F.col("a.dst") < F.col("b.dst"))) \
        .select(F.col("a.src").alias("center"),
                F.col("a.dst").alias("u"), F.col("b.dst").alias("v"))
    closed = wedges.join(
        und.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"], "left_semi")
    tri = closed.groupBy("center").agg(F.count(F.lit(1)).alias("triangles"))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out = (
        deg.withColumnRenamed("src", "node")
        .join(tri.withColumnRenamed("center", "node"), "node", "left")
        .select(
            "node",
            F.when(F.col("deg") >= 2,
                   2.0 * F.coalesce("triangles", F.lit(0))
                   / (F.col("deg") * (F.col("deg") - 1)))
            .otherwise(0.0).alias("clustering"),
        )
    )
    return out

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
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e.unpersist()
    return visited


def ego_network(edges: DataFrame, center: str, radius: int = 2,
                directed: bool = False) -> DataFrame:
    """Edges of the radius-hop neighborhood of `center`
    (traversal.rs:248 ego networks): both endpoints within radius."""
    spark = edges.sparkSession
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
    und = _bidir(edges).filter(F.col("src") != F.col("dst")).distinct() \
        .persist()
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
    und.unpersist()
    return out

"""PageRank as an iterative DataFrame join loop (reference graph/pagerank.rs).

The reference's dense/sparse kernel switch (pagerank.rs:91-113) is
irrelevant on Spark — edges stay a DataFrame at any scale; each power
iteration (`s' = (1-d)/N + d·Pᵀs`, damping 0.85, pagerank.rs:17-52) is one
shuffle on dst.  Dangling nodes' mass is redistributed uniformly (the
standard correction).  Lineage is cut with localCheckpoint every few
iterations so 100-iteration runs don't build a 100-stage plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 1,
    weighted: bool = False,
    reset: DataFrame | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """→ (node, rank) after `iterations` power steps (fixed-iteration form,
    exactly reproducible by an unrolled SQL oracle).

    `edges`: (src, dst[, weight]); direction src→dst.  Nodes = all ids on
    either side.  rank is rounded to 8 dp at the end only.

    `reset`: optional (node, weight) personalization vector → PERSONALIZED
    PageRank (reference retrieval/pagerank_retrieval.rs:20-120 and
    hipporag_ppr.rs:20-62 both reduce to this: teleport mass lands on the
    reset distribution instead of uniformly).  Weights are normalized to
    sum 1; dangling mass also follows the reset distribution.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    wcol = F.col("weight") if weighted else F.lit(1.0)
    out_w = edges.groupBy("src").agg(F.sum(wcol).alias("out_w"))
    norm_edges = (
        edges.join(out_w, "src")
        .select("src", "dst", (wcol / F.col("out_w")).alias("p"))
        .persist()
    )

    # dangling nodes are a static set — find them once; graphs without
    # them (e.g. symmetrized edges) skip the per-iteration driver sync
    dangling_nodes = nodes.join(
        out_w.withColumnRenamed("src", "node"), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0

    # teleport distribution: uniform, or the normalized reset vector
    if reset is not None:
        total_w = reset.agg(F.sum("weight")).collect()[0][0] or 1.0
        teleport = F.broadcast(
            nodes.join(reset, "node", "left")
            .select("node",
                    (F.coalesce(F.col("weight"), F.lit(0.0)) / total_w)
                    .alias("t"))
        ).persist()
    else:
        teleport = nodes.select("node", F.lit(1.0 / n).alias("t")).persist()

    if init_ranks is not None:
        # warm start (incremental recompute): carry over previous ranks,
        # new nodes start at the teleport mass; normalize to sum 1
        warm = (
            teleport.join(init_ranks.withColumnRenamed("rank", "prev"),
                          "node", "left")
            .select("node", F.coalesce("prev", "t").alias("rank0"))
        )
        total = warm.agg(F.sum("rank0")).collect()[0][0] or 1.0
        ranks = warm.select(
            "node", (F.col("rank0") / F.lit(total)).alias("rank"))
    else:
        ranks = teleport.select("node", F.col("t").alias("rank"))
    for i in range(iterations):
        contrib = (
            norm_edges
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("in_rank"))
        )
        if has_dangling:
            # dangling mass as a broadcast 1-row scalar, NOT a driver
            # collect: collecting forced one extra synchronous job per
            # iteration (2 barriers/step instead of 1 — half the loop's
            # wall time on small graphs); as a cross-joined aggregate it
            # rides inside the same job as the rank update.  Arithmetic
            # is unchanged (same sum over the same rows).
            dm_df = F.broadcast(
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")))
            dangling = F.col("dm")
        else:
            dm_df = None
            dangling = F.lit(0.0)
        nxt = teleport.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left")
        if dm_df is not None:
            nxt = nxt.crossJoin(dm_df)
        ranks = nxt.select(
            "node",
            ((1.0 - damping) * F.col("t")
             + F.lit(damping)
             * (F.coalesce(F.col("in_rank"), F.lit(0.0))
                + dangling * F.col("t"))).alias("rank"),
        )
        # materialize each step: the next iteration (and the dangling
        # aggregate) must not recompute the whole prefix of the loop
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)

    out = ranks.select("node", F.round(F.col("rank"), 8).alias("rank"))
    nodes.unpersist()
    norm_edges.unpersist()
    dangling_nodes.unpersist()
    teleport.unpersist()
    return out


def incremental_pagerank(
    edges: DataFrame,
    prev_ranks: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    weighted: bool = False,
) -> DataFrame:
    """G5 (reference graph/incremental/pagerank.rs:28-295): recompute
    ranks after a graph delta, warm-started from the previous solution.

    The reference tracks dirty nodes and re-solves locally; on Spark the
    distributed analogue is a warm-started power iteration over the NEW
    edge set — a handful of iterations from the previous fixed point
    converges where a cold start needs 10+, because the unchanged bulk
    of the graph is already at equilibrium.  Exact same fixed point as a
    full run (power iteration is memoryless in the limit).
    """
    return pagerank(edges, damping=damping, iterations=iterations,
                    weighted=weighted, init_ranks=prev_ranks)

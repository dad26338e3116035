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
    materialize_result: bool = True,
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
    # persist the INPUT edge set first: `nodes`, `out_w`/`norm_edges`,
    # and `dangling_nodes` all scan it, and callers routinely pass an
    # unmaterialized join (e.g. the bench's orders⋈lineitem graph) that
    # would otherwise recompute once per consumer (measured: ~40% of
    # query wall at sf0.1).  Skip when the caller already persisted —
    # persist/unpersist is not ref-counted, so unpersisting here would
    # silently evict a cache the caller still owns.
    own_edges_cache = edges.storageLevel.useMemory is False \
        and edges.storageLevel.useDisk is False
    if own_edges_cache:
        edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    # Setup stays fully LAZY: node count, normalization totals, and the
    # dangling set all become broadcast 1-row aggregates cross-joined
    # into the plan instead of driver collect()/count() calls — the
    # whole setup rides inside the first iteration's job (zero extra
    # barriers; the driver loop only submits one job per power step).
    # Arithmetic is bit-identical: JVM double division == Python float.
    n_df = F.broadcast(nodes.agg(
        F.count(F.lit(1)).cast("double").alias("n_nodes")))

    wcol = F.col("weight") if weighted else F.lit(1.0)
    out_w = edges.groupBy("src").agg(F.sum(wcol).alias("out_w"))
    norm_edges = (
        edges.join(out_w, "src")
        .select("src", "dst", (wcol / F.col("out_w")).alias("p"))
        .persist()
    )

    # dangling nodes are a static set — persisted once; when the graph
    # has none (e.g. symmetrized edges) the per-iteration aggregate over
    # the empty set costs one empty-scan inside the same job
    dangling_nodes = nodes.join(
        out_w.withColumnRenamed("src", "node"), "node", "left_anti"
    ).persist()

    # teleport distribution: uniform, or the normalized reset vector
    if reset is not None:
        _tw = F.coalesce(F.sum("weight"), F.lit(0.0))
        total_w_df = F.broadcast(reset.agg(
            # 0-or-empty reset degenerates to divisor 1 (matches the old
            # `collect()[0][0] or 1.0` driver-side semantics exactly)
            F.when(_tw == 0.0, F.lit(1.0)).otherwise(_tw).alias("total_w")))
        teleport = F.broadcast(
            nodes.join(reset, "node", "left").crossJoin(total_w_df)
            .select("node",
                    (F.coalesce(F.col("weight"), F.lit(0.0))
                     / F.col("total_w")).alias("t"))
        ).persist()
    else:
        teleport = nodes.crossJoin(n_df).select(
            "node", (F.lit(1.0) / F.col("n_nodes")).alias("t")).persist()

    if init_ranks is not None:
        # warm start (incremental recompute): carry over previous ranks,
        # new nodes start at the teleport mass; normalize to sum 1
        warm = (
            teleport.join(init_ranks.withColumnRenamed("rank", "prev"),
                          "node", "left")
            .select("node", F.coalesce("prev", "t").alias("rank0"))
        ).persist()
        _t0 = F.coalesce(F.sum("rank0"), F.lit(0.0))
        total_df = F.broadcast(warm.agg(
            F.when(_t0 == 0.0, F.lit(1.0)).otherwise(_t0).alias("total0")))
        ranks = warm.crossJoin(total_df).select(
            "node", (F.col("rank0") / F.col("total0")).alias("rank"))
    else:
        ranks = teleport.select("node", F.col("t").alias("rank"))
    for i in range(iterations):
        contrib = (
            norm_edges
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("in_rank"))
        )
        # dangling mass as a broadcast 1-row scalar, NOT a driver
        # collect: collecting forced one extra synchronous job per
        # iteration (2 barriers/step instead of 1 — half the loop's
        # wall time on small graphs); as a cross-joined aggregate it
        # rides inside the same job as the rank update.  Arithmetic
        # is unchanged (same sum over the same rows; empty set → 0.0).
        dm_df = F.broadcast(
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")))
        ranks = (
            teleport
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(dm_df)
            .select(
                "node",
                ((1.0 - damping) * F.col("t")
                 + F.lit(damping)
                 * (F.coalesce(F.col("in_rank"), F.lit(0.0))
                    + F.col("dm") * F.col("t"))).alias("rank"),
            )
        )
        # materialize each step: the next iteration (and the dangling
        # aggregate) must not recompute the whole prefix of the loop.
        # The LAST step checkpoints too — the unpersists below run at
        # plan-BUILD time, so a lazily returned final iteration would
        # recompute norm_edges/teleport uncached when the caller finally
        # evaluates (measured: ~40% of query wall; catastrophic when the
        # result feeds another pagerank call, as in the warm-start path)
        # (`materialize_result=False` keeps the last step lazy — only for
        # plan introspection, e.g. tools/explain_plans.py)
        if (i + 1) % checkpoint_every == 0 or (
                materialize_result and (i + 1) == iterations):
            ranks = ranks.localCheckpoint(eager=True)

    out = ranks.select("node", F.round(F.col("rank"), 8).alias("rank"))
    if own_edges_cache:
        edges.unpersist()
    nodes.unpersist()
    norm_edges.unpersist()
    dangling_nodes.unpersist()
    teleport.unpersist()
    if init_ranks is not None:
        warm.unpersist()
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

"""HITS (hubs & authorities) as an iterative DataFrame join loop.

Kleinberg 1999, fixed-iteration form (companion to algos/pagerank.py —
the reference ships PageRank, graph/pagerank.rs; HITS is the
engine-added dual for DIRECTED kg queries: "which entities point at the
important ones" vs "which are pointed at"):

    a'(v) = Σ_{u→v} h(u)      (one shuffle on dst)
    h'(u) = Σ_{u→v} a'(v)     (one shuffle on src)

with L1 normalization (scores sum to 1) after each half-step — a
documented variant of the classic L2 norm: the fixed point spans the
same principal eigenvector direction, and a plain SUM is exactly
replayable by the DuckDB oracle (no sqrt).  Like pagerank, the
fixed-iteration form is deterministic, so the oracle unrolls the exact
arithmetic; scores round to 8 dp at the END only.  Lineage is cut with
an eager localCheckpoint per iteration.

Nodes with no in-edges hold authority 0; no out-edges, hub 0 — every
node appears in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hits(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """→ (node, hub, authority) after `iterations` full HITS steps.

    `edges`: (src, dst), direction src→dst, deduplicated here.
    """
    e = edges.select("src", "dst").distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # L1-normalized uniform init (1/N): the init scale is irrelevant
    # once a half-step normalizes, but with iterations=0 the init IS
    # the output, and the module contract says scores sum to 1 — so
    # honor it from the start (uniform, like pagerank's zero-iteration
    # behavior).
    n_total = nodes.agg(F.count(F.lit(1)).alias("_n"))
    h = nodes.crossJoin(F.broadcast(n_total)) \
        .select("node", (F.lit(1.0) / F.col("_n")).alias("score"))

    def _half(frm: DataFrame, key: str, out: str) -> DataFrame:
        """One half-step: pull scores across edges onto `out`-side nodes,
        then L1-normalize; returns an eagerly-checkpointed frame."""
        raw = (
            e.join(frm, e[key] == frm["node"])
            .groupBy(e[out].alias("node"))
            .agg(F.sum("score").alias("x"))
        ).persist()
        # raw feeds BOTH the L1 total (a broadcast subjob) and the
        # normalize join; persisted, the broadcast job materializes it
        # once and the main stage reuses the cache — uncached, every
        # half-step ran the edge join + aggregation twice (measured
        # ~30% of the loop's wall).  The eager localCheckpoint below
        # consumes both readers, so raw is unpersisted immediately —
        # holding every iteration's node-sized aggregate until the end
        # of the loop was pure executor-storage dead weight (ADVICE r4).
        total = raw.agg(F.sum("x").alias("_t"))
        # the iterate carries ONLY nodes with a nonzero inflow: a node
        # absent from `raw` would score 0.0, and a 0.0 score contributes
        # nothing to the next half-step's edge join — dropping the row
        # is float-identical to summing its +0.0 terms.  The old
        # per-step left-join against the full node set (which existed
        # only to materialize those zeros) moves to the FINAL output
        # join; measured ~25% off the loop wall at sf0.1.
        stepped = (
            raw.crossJoin(F.broadcast(total))
            .select("node",
                    F.when(F.col("_t") > 0, F.col("x") / F.col("_t"))
                    .otherwise(0.0).alias("score"))
        ).localCheckpoint(eager=True)
        raw.unpersist()
        return stepped

    # iterations == 0 → uniform init for both sides, mirroring pagerank's
    # and lpa's graceful zero-iteration behavior (a=None would crash below)
    a = h
    for _ in range(int(iterations)):
        a = _half(h, "src", "dst")
        h = _half(a, "dst", "src")
    # zero-inflow nodes re-enter here (dropped from the iterate above):
    # every node appears in the output with explicit 0.0 scores
    out = (
        nodes
        .join(h.select("node", F.col("score").alias("_h")), "node", "left")
        .join(a.select("node", F.col("score").alias("_a")), "node", "left")
        .select("node",
                F.round(F.coalesce("_h", F.lit(0.0)), 8).alias("hub"),
                F.round(F.coalesce("_a", F.lit(0.0)), 8)
                .alias("authority"))
    ).localCheckpoint(eager=True)  # consumes nodes before the unpersists
    e.unpersist()
    nodes.unpersist()
    return out

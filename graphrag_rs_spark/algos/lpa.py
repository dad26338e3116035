"""Synchronous label-propagation communities (fixed-iteration form).

Raghavan et al. 2007, made deterministic and oracle-replayable the same
way algos/pagerank.py and algos/hits.py are: a FIXED number of
synchronous rounds, a total tie-break, and no randomness — so the
DuckDB oracle can unroll the exact arithmetic.  Companion to
algos/leiden.py (which already uses distributed LPA internally as the
giant-component fallback, `lpa:` marker); this module exposes the
standalone community operator the reference's community family implies
(graph/community.rs neighborhood-vote loop) as a first-class query.

Semantics per round, for every node v over the UNDIRECTED edge set:

    label'(v) = argmax_l ( |{u ∈ N(v) : label(u) = l}| + [label(v)=l] )

i.e. a neighbor-majority vote with the node's own label counted once
(the classic self-vote damping — without it, synchronous LPA 2-cycles
on bipartite graphs; with it the fixed point is stable and the
fixed-iteration output is meaningful, not just deterministic).  Ties
break to the LEXICOGRAPHICALLY SMALLEST label.  Initial label(v) = v.

The self-vote is realized as ONE SELF-LOOP PER NODE in the vote edge
set, not a union with the label frame — so each round's plan (and the
DuckDB oracle's CTE chain) references the previous labels exactly once;
a second reference inlines the unrolled oracle 2^rounds times (measured
~7×/round on the HITS oracle before the same fix).

Each round is two shuffles (vote count group-by + per-node argmax
window); lineage is cut with an eager localCheckpoint per round, the
same geometric-plan-growth guard measured necessary for cc/pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def lpa_communities(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """→ (node, community) after `iterations` synchronous LPA rounds.

    `edges`: (src, dst) treated as undirected (both directions union'd,
    deduplicated).  `community` is the surviving label — the id of some
    member node, stable across partitionings by the total tie-break.
    """
    ue0 = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = ue0.select(F.col("src").alias("node")).distinct()
    # self-vote as a self-loop: one edge (v, v) per node
    ue = (
        ue0.union(nodes.select(F.col("node").alias("src"),
                               F.col("node").alias("dst")))
        .persist()
    )
    labels = (
        nodes.withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(int(iterations)):
        votes = (
            ue.join(labels, ue["src"] == labels["node"])
            .select(ue["dst"].alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    ue.unpersist()
    return labels.select("node", F.col("label").alias("community"))

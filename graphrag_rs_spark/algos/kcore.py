"""k-core decomposition — engine-added graph-quality analytics.

No reference counterpart (graphrag-rs stops at degree/clustering
centralities, graph/analytics.rs:182-279); the k-core is the standard
"dense backbone" filter a KG-quality pipeline runs before expensive
per-community work: iteratively peel every node with degree < k until
none remains.

Spark shape: a driver loop of {degree agg → survivor semi-joins} with
an eager localCheckpoint per round to pin lineage (same discipline as
algos/cc.py).  The survivor list only shrinks, so each round's joins
are narrower than the last; rounds are bounded by the degeneracy
ordering depth (typically ≤ tens even on web graphs).  Peeling is
monotone: once converged, extra rounds are no-ops — which is what
makes the fixed-round unrolled-CTE DuckDB oracle (contract `kcore`)
exact, the same pattern as the pagerank oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_core(edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """Nodes of the k-core of a SYMMETRIC edge list (src, dst), with
    their degree inside the core subgraph → (node, degree).

    `edges` must contain both directions of every undirected edge (the
    convention of algos/cc.py and _cust_supp_edges); degree is then
    simply the src-side row count.  Converges when no node is below k;
    `max_rounds` is a runaway bound, not a tuning knob.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    # distinct like every sibling graph operator (cc/hits/lpa/linkpred):
    # duplicate edge rows would inflate degrees and keep sub-k nodes
    # in the "core"
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    deg = e.groupBy(F.col("src").alias("node")) \
        .agg(F.count(F.lit(1)).alias("degree"))
    for _ in range(max_rounds):
        # cheap convergence probe: any sub-k node at all?
        if deg.filter(F.col("degree") < k).limit(1).count() == 0:
            break
        keep = deg.filter(F.col("degree") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        deg = e.groupBy(F.col("src").alias("node")) \
            .agg(F.count(F.lit(1)).alias("degree"))
    return deg.filter(F.col("degree") >= k)

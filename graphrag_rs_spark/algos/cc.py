"""Distributed connected components: alternating small-star / large-star.

Implements the two-phase star-contraction algorithm of Kiveris et al.
("Connected Components in MapReduce and Beyond", SoCC'14) as plain
DataFrame joins — the canonicalization closure required by the north rule
(replaces the reference's in-memory greedy clustering,
string_similarity_linker.rs:68-127, and its petgraph CC,
graph/analytics.rs:97-155 / leiden.rs:988-1019).

Node ids are strings; the component label is the lexicographic MINIMUM
node id of the component (deterministic, and meaningful for entity ids).
Works at any scale: each iteration is one shuffle per star op, lineage is
truncated with localCheckpoint, convergence is detected by an edge-set
checksum (count + sum of xxhash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Orient src > dst, drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    No dedup here: `min` is duplicate-insensitive and the per-round
    dedup happens once in _small_star's output — two fewer shuffles per
    round than deduping every star op.
    """
    bidir = edges.union(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
    mins = bidir.groupBy("src").agg(F.min("dst").alias("mn")) \
        .select("src", F.least(F.col("mn"), F.col("src")).alias("m"))
    return (
        bidir.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u) to the min.

    Input may contain duplicates (see _large_star); output is the
    round's single dedup point.
    """
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(mins, "src")
    out = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst")) \
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Return (node: string, component: string) for every node.

    `edges` must have string columns (src, dst).  `nodes` (column: node)
    optionally adds isolated vertices, which label themselves.
    """
    e = _canon(edges).persist()
    prev = _checksum(e)          # one job: materializes the persist too
    retained = [e]
    for it in range(max_iterations):
        e = _small_star(_large_star(e))
        # truncate lineage periodically; otherwise persist alone cuts
        # recompute while the checksum aggregate doubles as the
        # materializing action — ONE job per round, not two
        if (it + 1) % 5 == 0:
            e = e.localCheckpoint(eager=False)
        e = e.persist()
        cur = _checksum(e)
        for old in retained:
            old.unpersist()
        retained = [e]
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations")

    # Converged: edge set is a star forest src(>dst) → root(dst = component min).
    labels = _canon(e).groupBy("src").agg(F.min("dst").alias("component")) \
        .select(F.col("src").alias("node"), "component")
    roots = labels.select(F.col("component").alias("node"),
                          F.col("component"))
    all_labeled = labels.union(roots).distinct()
    if nodes is not None:
        isolated = (
            nodes.select(F.col("node")).distinct()
            .join(all_labeled, "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        all_labeled = all_labeled.union(isolated)
    return all_labeled

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


def _driver_union_find(pdf) -> list[tuple[str, str]]:
    """Union-find with min-label roots over a pandas edge list."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:       # path compression
            parent[x], x = r, parent[x]
        return r

    seen: set[str] = set()
    for s, d in zip(pdf["src"], pdf["dst"]):
        seen.add(s)
        seen.add(d)
        rs, rd = find(s), find(d)
        if rs != rd:
            # min-label union keeps the component label = lexicographic
            # minimum, matching the distributed loop exactly
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    # sorted → deterministic row order (set iteration order is not)
    return sorted((n, find(n)) for n in seen)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
    driver_threshold: int = 2_000_000,
    driver_byte_budget: int = 256 << 20,
) -> DataFrame:
    """Return (node, component) for every node, component = min node id.

    `edges` needs columns (src, dst) of any orderable type (string ids
    in the kg pipeline, ints in knn_cc); output columns keep that type.
    `nodes` (column: node) optionally adds isolated vertices, which
    label themselves.

    Adaptive execution (same spirit as AQE's broadcast-join demotion):
    if the edge set fits on the driver (≤ `driver_threshold` rows AND
    ≤ `driver_byte_budget` estimated pandas bytes, probed via an
    incremental limit-collect), solve with union-find locally —
    the O(log n)-round join loop is pure fixed cost for small graphs and
    dominates pipeline latency.  Larger graphs (the 10^12-turn posture,
    where distinct entity names alone exceed driver memory) take the
    distributed small-star/large-star path.  Both produce the identical
    deterministic labeling: component = lexicographic min node id.
    """
    spark = edges.sparkSession
    e = _canon(edges).persist()

    if driver_threshold > 0:
        # probe the DEDUPED edge set (raw input may carry per-chunk
        # duplicates); limit(k+1) bounds driver transfer — ≤ k rows back
        # means we saw ALL edges.  The row cap alone is not enough:
        # 2M long-string pairs can be hundreds of MB of pandas on a busy
        # driver, so a small sample first estimates bytes/row and shrinks
        # the cap to fit `driver_byte_budget`.
        sample = e.limit(10_000).toPandas()
        if len(sample) < 10_000:
            cap, probe = driver_threshold, sample
        else:
            bpr = max(1, int(sample.memory_usage(deep=True).sum())
                      // len(sample))
            cap = min(driver_threshold,
                      max(10_000, driver_byte_budget // bpr))
            probe = e.limit(cap + 1).toPandas()
        if len(probe) <= cap:
            labels = _driver_union_find(probe)
            e.unpersist()
            # emit the same node dtype as the input edges so the driver
            # fast path and the distributed loop are interchangeable
            # (int ids stay int; also avoids the Arrow int->string
            # fallback warning)
            node_t = edges.schema["src"].dataType
            from pyspark.sql.types import StructField, StructType
            schema = StructType([StructField("node", node_t, False),
                                 StructField("component", node_t, False)])
            if labels:
                import pandas as pd
                all_labeled = spark.createDataFrame(
                    pd.DataFrame(labels, columns=["node", "component"]),
                    schema)
            else:
                all_labeled = spark.createDataFrame([], schema)
            if nodes is not None:
                isolated = (
                    nodes.select(F.col("node")).distinct()
                    .join(all_labeled, "node", "left_anti")
                    .select("node", F.col("node").alias("component"))
                )
                all_labeled = all_labeled.union(isolated)
            return all_labeled

    prev = _checksum(e)          # one job: materializes the persist too
    last_persisted = e
    for it in range(max_iterations):
        # EAGER localCheckpoint every round: persist() alone caches
        # execution but does NOT truncate the logical plan — each round
        # references the last ~4×, so plan analysis time (and driver
        # heap for plan trees) grows geometrically and kills the JVM
        # after ~10 rounds (measured: 9s → 29s → minutes per round on a
        # 39-edge path).  Eager checkpoint cuts the plan to a scan of
        # stored blocks: one extra job per round, strictly linear.
        # On a real cluster with executor loss, swap for reliable
        # checkpoint(): sc.setCheckpointDir + .checkpoint() every ~5
        # rounds; local mode has no executor loss.
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if last_persisted is not None:
            last_persisted.unpersist()
            last_persisted = None
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

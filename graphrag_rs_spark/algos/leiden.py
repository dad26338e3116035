"""Leiden community detection (G3) — per-component exact algorithm.

The reference runs Leiden on the whole in-memory graph
(graph/leiden.rs:689-791 local moving with cached community degrees,
:911-985 refinement = split disconnected communities).  That is
inherently sequential — but after canonicalization the entity graph's
connected components are small (SURVEY.md §7 risk 5), so the scalable
shape is: distributed CC first (algos/cc.py), then EXACT Leiden per
component inside `applyInPandas`, with component-prefixed community ids
for global uniqueness.  Wall-clock scales with the largest component,
not the graph.

Transliterated semantics:
  - init: one community per node (leiden.rs:794-803)
  - local moving: sweep nodes, move to the neighboring community with
    the best ΔQ (Newman modularity with resolution, leiden.rs:894-898),
    community-degree cache updated in place (leiden.rs:755-781),
    max 100 sweeps (leiden.rs:753)
  - refinement: split communities whose induced subgraph is
    disconnected (leiden.rs:911-985)
Documented deviation: node visit order is sorted(node_id) rather than
petgraph insertion order (deterministic either way; insertion order is
an artifact of the reference's build sequence, not a semantic).
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_SWEEPS = 100  # leiden.rs:753


def leiden_partition(
    nodes: list[str],
    edges: list[tuple[str, str]],
    resolution: float = 1.0,
) -> dict[str, int]:
    """Exact single-level Leiden over one (small) component."""
    order = sorted(set(nodes))
    adj: dict[str, set] = {n: set() for n in order}
    eset = set()
    for a, b in edges:
        if a == b or a not in adj or b not in adj:
            continue
        key = (a, b) if a < b else (b, a)
        if key in eset:
            continue
        eset.add(key)
        adj[a].add(b)
        adj[b].add(a)

    communities = {n: i for i, n in enumerate(order)}
    node_degree = {n: float(len(adj[n])) for n in order}
    total_edges = float(len(eset)) * 2.0
    if total_edges == 0:
        return communities

    community_degrees: dict[int, float] = defaultdict(float)
    for n in order:
        community_degrees[communities[n]] += node_degree[n]

    improved, sweeps = True, 0
    while improved and sweeps < MAX_SWEEPS:
        improved = False
        for n in order:
            cur = communities[n]
            k = node_degree[n]
            neigh_comms = {communities[m] for m in adj[n]}
            k_in_from = sum(1 for m in adj[n] if communities[m] == cur)
            sigma_from = community_degrees.get(cur, 0.0)
            best, best_delta = cur, 0.0
            for cand in neigh_comms:
                if cand == cur:
                    continue
                k_in_to = sum(1 for m in adj[n] if communities[m] == cand)
                sigma_to = community_degrees.get(cand, 0.0)
                # ΔQ — leiden.rs:894-898
                delta = ((k_in_to - k_in_from) / total_edges) \
                    - resolution * k * ((sigma_to - sigma_from + k)
                                        / (total_edges * total_edges))
                if delta > best_delta:
                    best_delta, best = delta, cand
            if best != cur:
                community_degrees[cur] -= k
                community_degrees[best] += k
                communities[n] = best
                improved = True
        sweeps += 1

    # refinement: split disconnected communities (leiden.rs:911-985)
    by_comm: dict[int, list[str]] = defaultdict(list)
    for n in order:
        by_comm[communities[n]].append(n)
    for cid in sorted(by_comm):
        members = by_comm[cid]
        comps = _components_within(adj, members)
        if len(comps) <= 1:
            continue
        max_id = max(communities.values())
        for idx, comp in enumerate(comps):
            new_id = max_id + idx + 1
            for n in comp:
                communities[n] = new_id
    return communities


def _components_within(adj: dict[str, set], members: list[str]) -> list[list[str]]:
    member_set = set(members)
    unvisited = set(members)
    out = []
    while unvisited:
        start = min(unvisited)          # deterministic
        stack, comp = [start], []
        unvisited.discard(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m in member_set and m in unvisited:
                    unvisited.discard(m)
                    stack.append(m)
        out.append(sorted(comp))
    return out


def label_propagation(node_rows: DataFrame, edge_rows: DataFrame,
                      iterations: int = 10) -> DataFrame:
    """Distributed synchronous label propagation over (component, src,
    dst) edges — the giant-component fallback: every step is joins +
    aggregations, so one huge component spreads across the cluster
    instead of serializing into (and OOMing) a single Leiden worker.

    Label update = most frequent neighbor label, ties broken by the
    LARGEST label (max over (count, label) structs — deterministic).
    → (component, node, label)."""
    bidir = edge_rows.select("component", "src", "dst").union(
        edge_rows.select("component", F.col("dst").alias("src"),
                         F.col("src").alias("dst"))).distinct() \
        .localCheckpoint(eager=True)
    labels = node_rows.select("component", F.col("src").alias("node")) \
        .distinct().withColumn("label", F.col("node")) \
        .localCheckpoint(eager=True)
    for _ in range(iterations):
        nbr = bidir.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst")
        counts = nbr.groupBy("component", "src", "label") \
            .agg(F.count(F.lit(1)).alias("n"))
        new = counts.groupBy("component", F.col("src").alias("node")).agg(
            F.max(F.struct("n", "label"))["label"].alias("new_label"))
        labels = (
            labels.join(new, ["component", "node"], "left")
            .select("component", "node",
                    F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def leiden_communities(
    triple_mentions: DataFrame,
    cc_labels: DataFrame,
    resolution: float = 1.0,
    level: int = 1,
    max_component_edges: int = 5_000_000,
    lpa_iterations: int = 10,
) -> DataFrame:
    """Distributed driver: CC labels shard the graph; exact Leiden runs
    per component in one applyInPandas pass.

    cc_labels: (node, component) from algos.cc.connected_components
    (node membership comes from cc_labels alone — every canonical entity
    has a CC label, so a separate entity list would be redundant).
    Returns (entity_id, level, community) with community ids globally
    unique as "{component}#{local_id}".

    Giant-component guard: a component with more than
    `max_component_edges` distinct edges would serialize the stage into
    one Leiden worker (and can OOM it) — those components fall back to
    distributed `label_propagation`, and their community ids carry an
    "lpa:" marker ("{component}#lpa:{label}") so the fallback is COUNTED
    by any consumer, never silent."""
    edges = (
        triple_mentions.select(F.col("subj").alias("src"),
                               F.col("obj").alias("dst"))
        .distinct()
        .join(cc_labels.withColumnRenamed("node", "src"), "src")
    )
    # one row per node (carrying its edges' endpoints) per component.
    # Eager checkpoint: the guard aggregate below runs as its own job at
    # build time and the exact/LPA paths scan the same rows again at
    # evaluation — uncached, the distinct+join prefix would run 2-3×
    edge_rows = edges.select("component", "src", "dst") \
        .localCheckpoint(eager=True)
    node_rows = cc_labels.select("component",
                                 F.col("node").alias("src"),
                                 F.lit(None).cast("string").alias("dst"))
    grouped = edge_rows.unionByName(node_rows)

    big = edge_rows.groupBy("component") \
        .agg(F.count(F.lit(1)).alias("_n")) \
        .filter(F.col("_n") > int(max_component_edges)) \
        .select("component").localCheckpoint(eager=True)
    fallback = None
    if not big.isEmpty():
        grouped = grouped.join(big, "component", "left_anti")
        lpa = label_propagation(
            node_rows.join(big, "component", "left_semi"),
            edge_rows.join(big, "component", "left_semi"),
            iterations=lpa_iterations)
        fallback = lpa.select(
            F.col("node").alias("entity_id"), F.lit(level).alias("level"),
            F.concat("component", F.lit("#lpa:"), "label").alias("community"))

    def run_leiden(pdf: pd.DataFrame) -> pd.DataFrame:
        component = pdf["component"].iloc[0]
        nodes = list(pdf["src"].dropna().unique())
        edge_list = [(a, b) for a, b in zip(pdf["src"], pdf["dst"])
                     if isinstance(b, str)]
        part = leiden_partition(nodes, edge_list, resolution)
        return pd.DataFrame({
            "entity_id": list(part.keys()),
            "level": level,
            "community": [f"{component}#{c}" for c in part.values()],
        })

    exact = grouped.groupBy("component").applyInPandas(
        run_leiden, schema="entity_id string, level int, community string")
    return exact if fallback is None else exact.unionByName(fallback)

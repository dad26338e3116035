"""Stage 5 — graph materialization, communities, statistics (G1, G2, G13).

The "graph" is its two DataFrames (entities = vertices, triples = edges);
materialization means: fold aliases into canonical entities, label
level-0 communities with connected components over the canonical edge
set (graph/analytics.rs:97-155 semantics), and compute the reference's
graph statistics (graph/mod.rs:349-406) as plain aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.algos.cc import connected_components


def canonical_entities(entities: DataFrame, canonical: DataFrame) -> DataFrame:
    """Fold alias entities into their canonical representative: mention
    counts sum, confidence maxes, name/type follow the canonical member."""
    is_canon = (F.col("entity_id") == F.col("canonical_id")).cast("int")
    merged = (
        entities.join(canonical, "entity_id")
        .groupBy("canonical_id")
        .agg(
            # the canonical member's name wins; (confidence, name) tie-breaks.
            # entity_type comes from the SAME winning member (F.first is
            # partition-order-nondeterministic and could pair the winner's
            # name with an alias's type when a component mixes types)
            F.max_by("name", F.struct(is_canon.alias("c"), "confidence",
                                      "name")).alias("name"),
            F.max_by("entity_type",
                     F.struct(is_canon.alias("c"), "confidence",
                              "name")).alias("entity_type"),
            F.max("confidence").alias("confidence"),
            F.sum("mention_count").alias("mention_count"),
            F.sort_array(F.collect_set("name")).alias("aliases"),
        )
        .select(
            F.col("canonical_id").alias("entity_id"),
            "name", "entity_type", "confidence", "mention_count", "aliases",
        )
    )
    return merged


def communities(entities: DataFrame, triples: DataFrame,
                max_iterations: int = 50) -> DataFrame:
    """Level-0 communities = connected components of the entity graph.

    Returns (entity_id, level, community) where community is the minimum
    entity_id of the component (deterministic string label).
    """
    edges = triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst"))
    comps = connected_components(
        edges,
        nodes=entities.select(F.col("entity_id").alias("node")),
        max_iterations=max_iterations,
    )
    return comps.select(
        F.col("node").alias("entity_id"),
        F.lit(0).alias("level"),
        F.col("component").alias("community"),
    )


def hierarchical_communities(entities: DataFrame, triples: DataFrame,
                             max_iterations: int = 50,
                             resolution: float = 1.0) -> DataFrame:
    """Level 0 = connected components; level 1 = exact Leiden within each
    component (graph/leiden.rs semantics via algos/leiden.py)."""
    from graphrag_rs_spark.algos.leiden import leiden_communities

    level0 = communities(entities, triples, max_iterations=max_iterations)
    cc_labels = level0.select(F.col("entity_id").alias("node"),
                              F.col("community").alias("component"))
    level1 = leiden_communities(
        triples, cc_labels, resolution=resolution, level=1)
    return level0.unionByName(level1)


def graph_stats(entities: DataFrame, triples: DataFrame,
                chunks: DataFrame, documents: DataFrame) -> DataFrame:
    """G13 (graph/mod.rs:349-406): one row of headline counts + per-type map."""
    per_type = entities.groupBy("entity_type").count()
    type_map = per_type.agg(
        F.map_from_arrays(F.collect_list("entity_type"),
                          F.collect_list("count")).alias("entities_per_type"))
    counts = (
        entities.agg(F.count("*").alias("entity_count"))
        .crossJoin(triples.agg(F.count("*").alias("relationship_count")))
        .crossJoin(chunks.agg(F.count("*").alias("chunk_count")))
        .crossJoin(documents.agg(F.count("*").alias("document_count")))
        .crossJoin(type_map)
    )
    return counts.withColumn(
        "avg_relationships_per_entity",
        F.when(F.col("entity_count") > 0,
               F.col("relationship_count") / F.col("entity_count"))
        .otherwise(F.lit(0.0)),
    )


def degree_table(triples: DataFrame) -> DataFrame:
    """Node degree (G8 baseline): undirected degree per entity."""
    ends = triples.select(F.col("subj").alias("entity_id")).union(
        triples.select(F.col("obj").alias("entity_id")))
    return ends.groupBy("entity_id").agg(F.count("*").alias("degree"))

"""R6 / L4 — embedding-based entity links, on top of hash embeddings.

Reference behavior: when embeddings are available the builder adds
semantic-similarity relationships between entities (R6 — semantic edges
alongside co-occurrence, graph/mod.rs similarity path) and the linker can
merge entities whose embeddings are close (L4 — semantic merging,
entity/mod.rs linking strategies).  The reference's default algorithmic
path skips both because no embeddings exist at build time; with the Q1
hash embedder (functions/embeddings.py) we can run them deterministically.

Scale shape: entity names embed through the broadcastable vocabulary
model; candidate generation is LSH-bucketed (never all-pairs) via
`operators/similarity.near_dup_pairs(n_planes=...)`; exact cosine only
inside buckets.  Both outputs are plain DataFrames that compose with the
existing pipeline: semantic merge pairs union into the canonicalization
edge set (same CC closure), semantic edges union into the triple set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.functions.embeddings import (hash_embeddings,
                                                    pack_embeddings)
from graphrag_rs_spark.operators.similarity import knn_graph, near_dup_pairs


def entity_embeddings(entities: DataFrame, dim: int = 64) -> DataFrame:
    """→ (entity_id, embedding array<double>): hash-TF of the entity name."""
    long_form = hash_embeddings(
        entities.select(F.col("entity_id"), F.col("name")),
        id_col="entity_id", text_col="name", dim=dim)
    return pack_embeddings(long_form).withColumnRenamed("id", "entity_id")


def semantic_merge_pairs(
    entities: DataFrame,
    min_sim: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    same_type_only: bool = True,
) -> DataFrame:
    """L4 → (src, dst): merge candidates whose name embeddings are close.

    LSH-bucketed (n_planes sign-bits) so candidate generation is
    ~n²/2^n_planes, not all-pairs.  Feed the result into the same
    connected-components closure as the string-similarity edges —
    `canonical_map(..., extra_edges=...)`.
    """
    emb = entity_embeddings(entities, dim)
    pairs = near_dup_pairs(emb, threshold=min_sim, id_col="entity_id",
                           vec_col="embedding", n_planes=n_planes) \
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"),
                "sim")
    if same_type_only:
        types = entities.select("entity_id", "entity_type")
        pairs = (
            pairs
            .join(types.withColumnRenamed("entity_id", "src")
                  .withColumnRenamed("entity_type", "ta"), "src")
            .join(types.withColumnRenamed("entity_id", "dst")
                  .withColumnRenamed("entity_type", "tb"), "dst")
            .filter(F.col("ta") == F.col("tb"))
            .select("src", "dst", "sim")
        )
    return pairs


def semantic_edges(
    entities: DataFrame,
    k: int = 3,
    min_sim: float = 0.5,
    dim: int = 64,
    pred: str = "RELATED_TO",
) -> DataFrame:
    """R6 → (subj, pred, obj, confidence): k-NN similarity triples.

    Edges are undirected (subj < obj) with confidence = rounded cosine;
    union them with the co-occurrence triples for a similarity-augmented
    graph, exactly the reference's embeddings-present construction mode.
    """
    emb = entity_embeddings(entities, dim)
    edges = knn_graph(emb, k=k, id_col="entity_id", vec_col="embedding")
    from graphrag_rs_spark.operators.similarity import cosine
    e = emb.select(F.col("entity_id").alias("src"),
                   F.col("embedding").alias("va"))
    e2 = emb.select(F.col("entity_id").alias("dst"),
                    F.col("embedding").alias("vb"))
    return (
        edges.join(e, "src").join(e2, "dst")
        .select(F.col("src").alias("subj"), F.lit(pred).alias("pred"),
                F.col("dst").alias("obj"),
                F.round(cosine(F.col("va"), F.col("vb")), 6)
                .alias("confidence"))
        .filter(F.col("confidence") >= min_sim)
    )

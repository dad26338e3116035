"""Stage 2 — pattern entity/mention extraction (E1-E7) as one Arrow UDF.

One mapInPandas pass over chunks emits one row per (chunk, entity) with
the mention list nested; `entities_table` / `mentions_table` then derive
the normalized tables with plain aggregations:

  per-chunk dedup (E4)  — already done inside the extractor
  per-graph dedup (E5)  — groupBy(entity_id).agg(max(confidence), ...)
  mentions (E2)         — explode(mentions)

Extraction cost is proportional to chunk text size, and chunks are
near-uniform (chunk_size bound), so a round-robin repartition before the
UDF flattens any conversation-length skew left over from assembly —
this is the "salted partitions" treatment of the north rule: the unit of
parallelism is the chunk, never the conversation.

Reference: entity/mod.rs:97-187 (extract_from_chunk) per chunk, driven by
lib.rs:514-523; confidence rules entity/mod.rs:731-769.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG
from graphrag_rs_spark import reference_logic as rl

CHUNK_ENTITY_SCHEMA = (
    "chunk_id string, doc_id string, entity_id string, name string, "
    "entity_type string, confidence double, "
    "mention_starts array<long>, mention_ends array<long>, first_offset long"
)


def extract_chunk_entities(
    chunks: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """chunks → one row per (chunk_id, entity), deterministic order fields.

    `first_offset` (min mention start) carries the deterministic pair
    ordering downstream (SURVEY.md §7 risk 3).
    """
    entity_types = tuple(cfg.entity_types)
    min_confidence = cfg.min_confidence

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "chunk_id", "doc_id", "entity_id", "name", "entity_type",
                "confidence", "mention_starts", "mention_ends",
                "first_offset")}
            for chunk_id, doc_id, content in zip(
                    pdf["chunk_id"], pdf["doc_id"], pdf["content"]):
                for e in rl.extract_from_chunk(content, entity_types,
                                               min_confidence):
                    out["chunk_id"].append(chunk_id)
                    out["doc_id"].append(doc_id)
                    out["entity_id"].append(e.entity_id)
                    out["name"].append(e.name)
                    out["entity_type"].append(e.entity_type)
                    out["confidence"].append(e.confidence)
                    out["mention_starts"].append([m.start for m in e.mentions])
                    out["mention_ends"].append([m.end for m in e.mentions])
                    out["first_offset"].append(
                        min((m.start for m in e.mentions), default=1 << 60))
            if out["chunk_id"]:  # empty frames break Arrow list-column typing
                yield pd.DataFrame(out)

    src = chunks.select("chunk_id", "doc_id", "content")
    if num_partitions:
        src = src.repartition(num_partitions)
    out = src.mapInPandas(extract_batches, schema=CHUNK_ENTITY_SCHEMA)
    # E6 allow/exclude name filters — declarative rlike, not inside the
    # UDF, so the whole-stage-codegen filter prunes rows before any
    # downstream shuffle
    if cfg.include_name_pattern:
        out = out.filter(F.col("name").rlike(cfg.include_name_pattern))
    for pat in cfg.exclude_name_patterns:
        out = out.filter(~F.col("name").rlike(pat))
    return out


ENTITY_STRUCT = (
    "entity_id: string, name: string, entity_type: string, "
    "confidence: double, mention_starts: array<long>, "
    "mention_ends: array<long>, first_offset: long"
)


def extract_chunk_bundles(
    chunks: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    extra: dict[str, F.Column] | None = None,
) -> DataFrame:
    """chunks → ONE row per chunk: (chunk_id, doc_id, ents: array<struct>,
    *extra passthrough columns).

    The per-chunk array keeps extract_from_chunk's deterministic
    (first_offset, entity_id) order, which makes downstream pair
    emission a map-side array expansion instead of a self-join — the
    bundle form exists so the triple stage needs NO shuffle at all
    (triples.emit_triple_mentions_from_bundles).  `extra` columns
    (e.g. the predicate-rule context flags) are computed JVM-side from
    the chunk row and ride through the Arrow batch untouched, avoiding a
    join to get them back beside the pairs.

    E6 allow/exclude filters apply to the ARRAY here (order-preserving
    F.filter), so every consumer — entity/mention tables and pairs —
    sees the same filtered view, exactly like the exploded path.
    """
    entity_types = tuple(cfg.entity_types)
    min_confidence = cfg.min_confidence
    extra = extra or {}
    extra_names = list(extra)
    schema = (f"chunk_id string, doc_id string, "
              f"ents array<struct<{ENTITY_STRUCT}>>")
    src = chunks.select("chunk_id", "doc_id", "content",
                        *[c.alias(n) for n, c in extra.items()])
    if extra_names:
        schema += ", " + ", ".join(
            f"{n} {src.schema[n].dataType.simpleString()}"
            for n in extra_names)
    if num_partitions:
        src = src.repartition(num_partitions)

    def bundle_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ents_col = [
                [
                    {
                        "entity_id": e.entity_id,
                        "name": e.name,
                        "entity_type": e.entity_type,
                        "confidence": e.confidence,
                        "mention_starts": [m.start for m in e.mentions],
                        "mention_ends": [m.end for m in e.mentions],
                        "first_offset": min(
                            (m.start for m in e.mentions), default=1 << 60),
                    }
                    for e in rl.extract_from_chunk(content, entity_types,
                                                   min_confidence)
                ]
                for content in pdf["content"]
            ]
            out = pdf[["chunk_id", "doc_id", *extra_names]].copy()
            out["ents"] = ents_col
            yield out[["chunk_id", "doc_id", "ents", *extra_names]]

    out = src.mapInPandas(bundle_batches, schema=schema)
    # E6 allow/exclude name filters on the array (JVM, order-preserving)
    ents = F.col("ents")
    if cfg.include_name_pattern:
        ents = F.filter(ents,
                        lambda e: e["name"].rlike(cfg.include_name_pattern))
    for pat in cfg.exclude_name_patterns:
        ents = F.filter(ents, lambda e: ~e["name"].rlike(pat))
    if cfg.include_name_pattern or cfg.exclude_name_patterns:
        out = out.withColumn("ents", ents)
    return out


def chunk_entities_from_bundles(bundles: DataFrame) -> DataFrame:
    """Bundle rows → the classic exploded chunk_entities table
    (CHUNK_ENTITY_SCHEMA, one row per (chunk, entity)) — a pure
    map-side explode, no shuffle."""
    e = bundles.select("chunk_id", "doc_id", F.explode("ents").alias("e"))
    return e.select(
        "chunk_id", "doc_id", "e.entity_id", "e.name", "e.entity_type",
        "e.confidence", "e.mention_starts", "e.mention_ends",
        "e.first_offset")


def entities_table(chunk_entities: DataFrame) -> DataFrame:
    """Graph-level entity dedup (E5, graph/mod.rs:243-265): merge by
    entity_id, keep max confidence, count mentions."""
    return (
        chunk_entities
        .groupBy("entity_id")
        .agg(
            F.max_by("name", F.struct("confidence", "name")).alias("name"),
            F.first("entity_type").alias("entity_type"),
            F.max("confidence").alias("confidence"),
            F.sum(F.size("mention_starts")).alias("mention_count"),
        )
    )


def mentions_table(chunk_entities: DataFrame) -> DataFrame:
    """Normalized mentions (E2): entity_id, chunk_id, offsets, confidence."""
    m = chunk_entities.select(
        "entity_id", "chunk_id", "confidence",
        F.explode(F.arrays_zip(
            F.col("mention_starts").alias("start"),
            F.col("mention_ends").alias("end"),
        )).alias("m"))
    return m.select(
        "entity_id", "chunk_id",
        F.col("m.start").alias("start_offset"),
        F.col("m.end").alias("end_offset"),
        "confidence",
    )

"""The end-to-end indexing pipeline (reference lib.rs:382-591 flow).

    transcripts → documents → chunks → chunk_entities
               → entities/mentions → triples
               → canonical_map → canonical entities/triples
               → communities → stats

Two drivers:
  run_pipeline           — in-memory DataFrames (tests, benchmarks)
  run_pipeline_checkpointed — every stage materialized to parquet with
                              per-partition lineage; resumable (I1-I3)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG
from graphrag_rs_spark.stages import chunking, extraction, triples as triples_mod
from graphrag_rs_spark.stages import canonicalize, materialize
from graphrag_rs_spark.stages.checkpoint import CheckpointManager


@dataclass
class PipelineResult:
    documents: DataFrame
    chunks: DataFrame
    chunk_entities: DataFrame
    entities: DataFrame
    mentions: DataFrame
    triples: DataFrame
    canonical_map: DataFrame
    canonical_triples: DataFrame
    canonical_entities: DataFrame
    communities: DataFrame


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> PipelineResult:
    num_partitions = num_partitions or cfg.shuffle_partitions

    documents = chunking.assemble_documents(transcripts)
    chunks = chunking.chunk_documents(documents, cfg,
                                      num_partitions=num_partitions)
    # chunks feed three consumers (extraction, context flags, stats)
    chunks = chunks.persist()
    chunk_entities = extraction.extract_chunk_entities(chunks, cfg).persist()
    entities = extraction.entities_table(chunk_entities)
    mentions = extraction.mentions_table(chunk_entities)
    raw_triples = triples_mod.emit_triples(chunk_entities, chunks, cfg)

    entities = entities.persist()
    raw_triples = raw_triples.persist()

    canon = canonicalize.canonical_map(entities, cfg).persist()
    canon_triples = canonicalize.rewrite_triples(raw_triples, canon).persist()
    canon_entities = materialize.canonical_entities(entities, canon)
    comms = materialize.communities(canon_entities, canon_triples,
                                    max_iterations=cfg.cc_max_iterations)

    return PipelineResult(
        documents=documents,
        chunks=chunks,
        chunk_entities=chunk_entities,
        entities=entities,
        mentions=mentions,
        triples=raw_triples,
        canonical_map=canon,
        canonical_triples=canon_triples,
        canonical_entities=canon_entities,
        communities=comms,
    )


def run_pipeline_checkpointed(
    spark: SparkSession,
    transcripts: DataFrame,
    workdir: str,
    run_id: str = "run0",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    num_partitions: int | None = None,
) -> PipelineResult:
    """Stage-materialized, resumable variant: kill it after any stage and a
    rerun with resume=True skips committed stages byte-identically."""
    num_partitions = num_partitions or cfg.shuffle_partitions
    ck = CheckpointManager(spark, workdir, run_id)

    documents = ck.run_stage(
        "documents", lambda: chunking.assemble_documents(transcripts), resume)
    chunks = ck.run_stage(
        "chunks",
        lambda: chunking.chunk_documents(documents, cfg, num_partitions),
        resume)
    chunk_entities = ck.run_stage(
        "chunk_entities",
        lambda: extraction.extract_chunk_entities(chunks, cfg), resume)
    entities = ck.run_stage(
        "entities", lambda: extraction.entities_table(chunk_entities), resume)
    mentions = ck.run_stage(
        "mentions", lambda: extraction.mentions_table(chunk_entities), resume)
    raw_triples = ck.run_stage(
        "triples",
        lambda: triples_mod.emit_triples(chunk_entities, chunks, cfg), resume)
    canon = ck.run_stage(
        "canonical_map", lambda: canonicalize.canonical_map(entities, cfg),
        resume)
    canon_triples = ck.run_stage(
        "canonical_triples",
        lambda: canonicalize.rewrite_triples(raw_triples, canon), resume)
    canon_entities = ck.run_stage(
        "canonical_entities",
        lambda: materialize.canonical_entities(entities, canon), resume)
    comms = ck.run_stage(
        "communities",
        lambda: materialize.communities(canon_entities, canon_triples,
                                        cfg.cc_max_iterations),
        resume)

    return PipelineResult(
        documents=documents, chunks=chunks, chunk_entities=chunk_entities,
        entities=entities, mentions=mentions, triples=raw_triples,
        canonical_map=canon, canonical_triples=canon_triples,
        canonical_entities=canon_entities, communities=comms,
    )

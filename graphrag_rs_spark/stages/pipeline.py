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
    triple_mentions: DataFrame          # flat (chunk_id, subj, pred, obj)
    triples: DataFrame                  # + confidence, context_chunks
    canonical_map: DataFrame
    canonical_triple_mentions: DataFrame
    canonical_triples: DataFrame
    canonical_entities: DataFrame
    communities: DataFrame
    # oversized blocking buckets excluded from canonicalization — lazy in
    # run_pipeline (consume to count), materialized + lineage-counted as
    # its own stage in run_pipeline_checkpointed
    dropped_blocks: DataFrame | None = None


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
    # chunks feed two consumers (bundle extraction, stats)
    chunks = chunks.persist()
    # ONE extraction pass emits per-chunk entity ARRAYS with the
    # predicate context flags riding through the Arrow batch, so pair
    # emission is a map-side array expansion (no self-join, no flags
    # join — zero shuffles in the triple stage)
    bundles = extraction.extract_chunk_bundles(
        chunks, cfg, num_partitions=num_partitions,
        extra=triples_mod.context_flag_columns()).persist()
    chunk_entities = extraction.chunk_entities_from_bundles(bundles)
    entities = extraction.entities_table(chunk_entities)
    mentions = extraction.mentions_table(chunk_entities)
    flat = triples_mod.emit_triple_mentions_from_bundles(bundles, cfg)

    entities = entities.persist()
    # flat is NOT persisted: its producer join is cheap to recompute from
    # the persisted chunk_entities, and caching 10⁷+ wide rows costs more
    # than both downstream recomputes combined (measured)

    # one blocking pass shared by canonical_map and dropped_block_stats
    # (lazy checkpoint: materializes on first use, both consumers reuse)
    keyed = canonicalize.shared_blocked_keys(entities)
    canon = canonicalize.canonical_map(entities, cfg, keyed=keyed).persist()
    # The 10⁷-row rewritten stream is NEVER materialized: with the
    # bundle path its recompute from persisted `bundles` is a map-side
    # expansion + broadcast join (~8s at 2.16M turns), so serializing it
    # (51.6s localCheckpoint measured at the same size) costs far more
    # than folding it in flight.  Instead the FOLDED canonical triple
    # table — distinct (subj, pred, obj), orders of magnitude smaller —
    # is the checkpointed artifact, and every downstream consumer
    # (communities' edge set, exports, stats) reads the fold.
    # ONE rewrite call: the eager alias-cap probe inside
    # rewrite_triple_mentions (limit(hot_k+1).count()) is a real Spark
    # job, so building the raw and deduped forms from separate calls
    # paid it twice.  The flat (distinct) form is derived from the raw
    # stream exactly as dedup=True would have built it.
    canon_raw = canonicalize.rewrite_triple_mentions(
        flat, canon, cfg, mention_counts=entities, dedup=False)
    canon_flat = (canon_raw
                  .repartition(cfg.shuffle_partitions, "subj", "obj")
                  .distinct())
    # fold the RAW (un-deduped) rewrite: collect_set subsumes the
    # distinct, so this is ONE shuffle of the flat stream, not two
    canon_triples = triples_mod.triples_with_context(canon_raw, cfg) \
        .localCheckpoint(eager=True)
    canon_entities = materialize.canonical_entities(entities, canon)
    # CC over the folded edge set: identical components (edge multiplicity
    # is irrelevant to connectivity), tiny input instead of the flat stream
    comms = materialize.communities(canon_entities, canon_triples,
                                    max_iterations=cfg.cc_max_iterations)

    return PipelineResult(
        documents=documents,
        chunks=chunks,
        chunk_entities=chunk_entities,
        entities=entities,
        mentions=mentions,
        triple_mentions=flat,
        triples=triples_mod.triples_with_context(flat, cfg),
        canonical_map=canon,
        canonical_triple_mentions=canon_flat,
        canonical_triples=canon_triples,
        canonical_entities=canon_entities,
        communities=comms,
        dropped_blocks=canonicalize.dropped_block_stats(entities,
                                                        keyed=keyed),
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
    bundles = ck.run_stage(
        "chunk_bundles",
        lambda: extraction.extract_chunk_bundles(
            chunks, cfg, num_partitions,
            extra=triples_mod.context_flag_columns()),
        resume)
    chunk_entities = ck.run_stage(
        "chunk_entities",
        lambda: extraction.chunk_entities_from_bundles(bundles), resume)
    entities = ck.run_stage(
        "entities", lambda: extraction.entities_table(chunk_entities), resume)
    mentions = ck.run_stage(
        "mentions", lambda: extraction.mentions_table(chunk_entities), resume)
    flat = ck.run_stage(
        "triple_mentions",
        lambda: triples_mod.emit_triple_mentions_from_bundles(bundles, cfg),
        resume)
    raw_triples = ck.run_stage(
        "triples", lambda: triples_mod.triples_with_context(flat, cfg),
        resume)
    # "counted, never silently": oversized blocking buckets excluded from
    # merging are materialized + lineage-counted beside the map itself
    dropped = ck.run_stage(
        "canonical_map_dropped_blocks",
        lambda: canonicalize.dropped_block_stats(entities), resume)
    canon = ck.run_stage(
        "canonical_map", lambda: canonicalize.canonical_map(entities, cfg),
        resume)
    canon_flat = ck.run_stage(
        "canonical_triple_mentions",
        lambda: canonicalize.rewrite_triple_mentions(
            flat, canon, cfg, mention_counts=entities), resume)
    canon_triples = ck.run_stage(
        "canonical_triples",
        lambda: triples_mod.triples_with_context(canon_flat, cfg), resume)
    canon_entities = ck.run_stage(
        "canonical_entities",
        lambda: materialize.canonical_entities(entities, canon), resume)
    comms = ck.run_stage(
        "communities",
        lambda: materialize.communities(canon_entities, canon_flat,
                                        cfg.cc_max_iterations),
        resume)

    return PipelineResult(
        documents=documents, chunks=chunks, chunk_entities=chunk_entities,
        entities=entities, mentions=mentions,
        triple_mentions=flat, triples=raw_triples,
        canonical_map=canon, canonical_triple_mentions=canon_flat,
        canonical_triples=canon_triples,
        canonical_entities=canon_entities, communities=comms,
        dropped_blocks=dropped,
    )

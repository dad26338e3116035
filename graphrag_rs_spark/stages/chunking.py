"""Stage 1 — turn → document assembly and chunking (T1).

Assembly is pure DataFrame work (one shuffle on conv_id): turns are
collected per conversation with their ordering key, sorted inside the
aggregate (sort_array on struct(turn_idx, ...) — JVM-side, no Python), and
joined with '\\n'.  The per-turn offset table comes from a window over
(conv_id, turn_idx) — the "stable turn ordering" contract of the north
rule — and makes the per-turn text-equality invariant a pure SQL check.

Chunking (reference text/mod.rs:123-168) is inherently sequential *within*
a document (each chunk's start depends on the previous boundary), so it
runs as an Arrow-batched mapInPandas over assembled documents — one Python
call per batch of documents, never per row.  Documents are independent,
so scale-out is linear in conversations; we repartition the output so the
downstream extraction sees size-balanced partitions regardless of the
heavy-tailed conversation-length distribution (the skew knob).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG
from graphrag_rs_spark import reference_logic as rl

CHUNK_SCHEMA = (
    "chunk_id string, doc_id string, content string, "
    "start_offset long, end_offset long, chunk_seq int"
)


def assemble_documents(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, text, ...) → (doc_id, content).

    One conversation = one reference Document (lib.rs:313-342); content =
    turns joined with '\\n' in turn_idx order.
    """
    return (
        transcripts
        # co-partition by conv_id before the object aggregation so each
        # task's collect_list map holds only its own conversations (the
        # same partial-agg memory discipline as triples_with_context)
        .repartition("conv_id")
        .groupBy(F.col("conv_id").alias("doc_id"))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("content")
        )
    )


def turn_offsets(transcripts: DataFrame) -> DataFrame:
    """Per-turn (start, end) code-point offsets into the assembled content.

    start = sum(length(text)+1) over all prior turns of the conversation.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.length("text") + 1).over(w), F.lit(0))
    return transcripts.select(
        F.col("conv_id").alias("doc_id"),
        "turn_idx",
        "text",
        start.alias("turn_start"),
        (start + F.length("text")).alias("turn_end"),
    )


def chunk_documents(
    documents: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, content) → chunks (reference text/mod.rs:123-168 semantics).

    chunk_id = f"{doc_id}_{seq}" (text/mod.rs:143).
    """
    chunk_size, overlap = cfg.chunk_size, cfg.chunk_overlap
    splitter = (rl.hierarchical_chunk_text
                if cfg.chunking_strategy == "hierarchical"
                else rl.chunk_text)

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("chunk_id", "doc_id", "content",
                                     "start_offset", "end_offset", "chunk_seq")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for ch in splitter(content, chunk_size, overlap):
                    out["chunk_id"].append(f"{doc_id}_{ch.seq}")
                    out["doc_id"].append(doc_id)
                    out["content"].append(ch.content)
                    out["start_offset"].append(ch.start)
                    out["end_offset"].append(ch.end)
                    out["chunk_seq"].append(ch.seq)
            if out["chunk_id"]:
                yield pd.DataFrame(out)

    docs = documents
    if num_partitions:
        docs = docs.repartition(num_partitions)
    return docs.mapInPandas(chunk_batches, schema=CHUNK_SCHEMA)


def verify_turn_equality(transcripts: DataFrame, chunks: DataFrame) -> DataFrame:
    """The per-turn text-equality invariant as one aggregate row.

    Every turn fully contained in a chunk must appear verbatim at
    (turn_start - chunk.start_offset) inside the chunk content; and every
    turn must be recoverable from the assembled document.  Returns
    (turns, covered_turns, mismatched_turns); correctness gate expects
    mismatched_turns == 0.
    """
    offs = turn_offsets(transcripts)
    joined = offs.join(chunks, "doc_id").where(
        (F.col("turn_start") >= F.col("start_offset"))
        & (F.col("turn_end") <= F.col("end_offset"))
    )
    check = joined.select(
        "doc_id", "turn_idx",
        (
            F.substring(
                F.col("content"),
                (F.col("turn_start") - F.col("start_offset") + 1).cast("int"),
                (F.col("turn_end") - F.col("turn_start")).cast("int"),
            )
            == F.col("text")
        ).alias("ok"),
    )
    per_turn = check.groupBy("doc_id", "turn_idx").agg(
        F.max(F.col("ok").cast("int")).alias("ok"))
    total_turns = transcripts.select("conv_id", "turn_idx").distinct().count()
    agg = per_turn.agg(
        F.count(F.lit(1)).alias("covered_turns"),
        F.sum(F.when(F.col("ok") == 0, 1).otherwise(0)).alias("mismatched_turns"),
    )
    return agg.select(
        F.lit(total_turns).alias("turns"), "covered_turns", "mismatched_turns")

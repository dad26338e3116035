"""Streaming exact deduplication of a document/turn stream.

A live feed re-delivers content: at-least-once sources replay rows, and
crawled/ingested corpora repeat documents verbatim. This drops exact
duplicates ON THE STREAM, before anything downstream pays for them —
keyed by the same normalized-text h60 content hash the batch operator
uses (``operators/dedup.exact_duplicates``), so stream-side survivors
match the batch dedup's grouping key exactly.

``dropDuplicatesWithinWatermark`` is the native engine primitive: state
holds one row per content hash only until the watermark passes its
event time plus the delay, so state is bounded by the duplication
window, not the stream's lifetime. An unbounded ``dropDuplicates``
would grow state forever — at a 10¹²-turn feed that is the difference
between a working job and an OOM.

Semantics: the FIRST arrival of each content hash within the watermark
window survives; later identical payloads are dropped even if their ids
differ (content identity, not row identity — matching the batch
operator's group-by-text contract). Duplicates separated by more than
``delay`` of event time may both survive, the documented watermark
trade: bounded state buys a bounded dedup horizon.

The reference has no streaming engine (SURVEY §2.10); this extends the
engine-added streaming family (sessionize, windowed) with the curation
op its training-data mandate needs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.functions.hashing import h60, norm_text


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    delay: str = "10 minutes",
) -> DataFrame:
    """→ the input stream minus exact-duplicate payloads (plus a
    ``text_hash`` column for downstream joins against batch dedup
    tables).

    `docs` must be a streaming DataFrame with an event-time column.
    State: one row per distinct content hash, freed once the watermark
    passes its event time + `delay`.
    """
    hashed = docs.withColumn("text_hash", h60(norm_text(text_col)))
    return (hashed
            .withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(["text_hash"]))

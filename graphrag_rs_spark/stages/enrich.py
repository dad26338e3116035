"""T7 — chunk enrichment (reference text/chunk_enricher.rs; ChunkMetadata
core/metadata.rs): per-chunk keywords + extractive summary + chapter tag.

All JVM-side built-ins (no UDF): tokenization via split/regexp, keyword
ranking via a count aggregation + row_number window, summary via
regexp_extract.  Keyword scoring is per-chunk term frequency with a
stopword filter — the reference enricher's non-TF-IDF path (its TF-IDF
path is retrieval/tfidf.py over documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_STOP = ("the and of to in is that it was for a an as at by be on or with "
         "this are from he she they we you i his her its their our your not "
         "but had has have will would could should").split()

FIRST_SENTENCE_RE = r"^\s*(.*?[.!?])(?:\s|$)"
CHAPTER_RE = r"(?i)^\s*(chapter\s+[\divxlc]+|section\s+\d+(?:\.\d+)*)"


def enrich_chunks(chunks: DataFrame, top_k: int = 5) -> DataFrame:
    """→ chunks + (keywords: array<string>, summary: string, chapter: string).

    Deterministic: keyword ties break alphabetically; summary is the
    first sentence (or the full content when no sentence end exists).
    """
    toks = chunks.select(
        "chunk_id",
        F.explode(F.expr(
            "filter(split(trim(regexp_replace(lower(content), "
            "'[^a-z0-9]+', ' ')), ' '), x -> length(x) > 2)")).alias("tok"),
    ).filter(~F.col("tok").isin(_STOP))

    counts = toks.groupBy("chunk_id", "tok").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("chunk_id").orderBy(
        F.col("tf").desc(), F.col("tok").asc())
    keywords = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .groupBy("chunk_id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("rn", "tok"))),
            lambda s: s["tok"]).alias("keywords"))
    )

    sent = F.regexp_extract(F.col("content"), FIRST_SENTENCE_RE, 1)
    return (
        chunks.join(keywords, "chunk_id", "left")
        .withColumn("keywords", F.coalesce(
            "keywords", F.array().cast("array<string>")))
        .withColumn("summary",
                    F.when(F.length(sent) > 0, sent)
                    .otherwise(F.substring("content", 1, 200)))
        .withColumn("chapter", F.regexp_extract(
            F.col("content"), CHAPTER_RE, 1))
    )

"""T3 — semantic chunker: breakpoints from embedding similarity.

Reference (text/semantic_chunking.rs:83-330 SemanticChunker): split to
sentences, embed each, take cosine distance between sentence i and
i+buffer, pick a per-document threshold (Percentile 95 default /
StandardDeviation / Absolute), break where distance exceeds it, assemble
chunks with min/max-size rules.

Spark decomposition — the heavy work is all JVM expressions:
  1. sentence split: mapInPandas transliteration (small Python, same
     pattern as the T1 chunker)
  2. sentence embeddings: functions/embeddings.hash_embeddings (the
     reference wires its EmbeddingGenerator here too) — long form, so
  3. consecutive cosine = ONE equi-join on (doc_id, sent_idx+buffer, dim)
     + sum(a·b): unit vectors make the dot product the cosine; no
     pairwise explosion, no Python
  4. per-document threshold: exact transliterated arithmetic over the
     per-doc distance list (sorted-array index for percentile,
     mean + k·stddev_pop) — plain aggregations
  5. chunk assembly: applyInPandas per document running the
     transliterated create_chunks (its skip-small-segment quirk is
     sequential by nature; per-doc data is tiny by then)

Deviation noted: the reference numbers chunks with a GLOBAL AtomicU64
counter (chunking_strategies.rs:15-16) — unreproducible by design; we
use the deterministic (doc_id, chunk_seq) instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark import reference_logic as rl
from graphrag_rs_spark.functions.embeddings import hash_embeddings

SENT_SCHEMA = "doc_id string, sent_idx long, sentence string"
CHUNK_SCHEMA = ("doc_id string, chunk_seq long, content string, "
                "start_sentence long, end_sentence long, "
                "sentence_count long")


def split_sentences_df(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    src = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sent_idx": [], "sentence": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                for i, s in enumerate(rl.split_sentences(text or "")):
                    out["doc_id"].append(did)
                    out["sent_idx"].append(i)
                    out["sentence"].append(s)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=SENT_SCHEMA)


def semantic_chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "percentile",     # percentile | stddev | absolute
    threshold_amount: float = 95.0,   # pct / n·σ / distance
    min_chunk_size: int = 1,
    max_chunk_size: int = 0,
    buffer_size: int = 1,
    dim: int = 64,
) -> DataFrame:
    """docs → (doc_id, chunk_seq, content, start/end_sentence, count)."""
    sents = split_sentences_df(docs, id_col, text_col).persist()

    n_sent = sents.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    # single-sentence docs: reference returns the ORIGINAL text verbatim
    # (semantic_chunking.rs:106-117)
    single = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("content"))
        .join(n_sent.filter(F.col("n") == 1), "doc_id", "semi")
        .select("doc_id", F.lit(0).alias("chunk_seq"), "content",
                F.lit(0).alias("start_sentence"),
                F.lit(1).alias("end_sentence"),
                F.lit(1).alias("sentence_count"))
    )

    multi = sents.join(n_sent.filter(F.col("n") > 1), "doc_id", "semi")

    sid = F.concat_ws("\x1f", "doc_id", "sent_idx")
    emb = hash_embeddings(
        multi.select(sid.alias("sid"), "sentence"),
        id_col="sid", text_col="sentence", dim=dim,
        broadcast_vocab=False,
    ).select(
        F.split_part("id", F.lit("\x1f"), F.lit(1)).alias("doc_id"),
        F.split_part("id", F.lit("\x1f"), F.lit(2)).cast("long")
        .alias("sent_idx"),
        "dim", "value")

    # consecutive cosine distance: unit vectors → dot = cosine
    a, b = emb.alias("a"), emb.alias("b")
    dist = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) &
               (F.col("b.sent_idx") == F.col("a.sent_idx") + buffer_size) &
               (F.col("a.dim") == F.col("b.dim")))
        .groupBy(F.col("a.doc_id").alias("doc_id"),
                 F.col("a.sent_idx").alias("i"))
        .agg((1.0 - F.sum(F.col("a.value") * F.col("b.value")))
             .alias("distance"))
    )

    if strategy == "percentile":
        # sorted[min(floor(len·p/100), len-1)] — rs:245-254
        thr = dist.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("distance")).alias("arr"))
        thr = thr.select(
            "doc_id",
            F.element_at(
                "arr",
                (F.least(
                    F.floor(F.size("arr") * threshold_amount / 100.0),
                    F.size("arr") - 1) + 1).cast("int")).alias("thr"))
    elif strategy == "stddev":
        # mean + k·σ with population variance — rs:256-266
        thr = dist.groupBy("doc_id").agg(
            (F.avg("distance")
             + threshold_amount * F.stddev_pop("distance")).alias("thr"))
    elif strategy == "absolute":
        thr = dist.select("doc_id").distinct().select(
            "doc_id", F.lit(float(threshold_amount)).alias("thr"))
    else:
        raise ValueError(f"unknown breakpoint strategy: {strategy}")

    breaks = (
        dist.join(thr, "doc_id")
        .filter(F.col("distance") > F.col("thr"))
        .select("doc_id", (F.col("i") + 1).alias("bp"))
    )

    per_doc = (
        multi.select("doc_id", "sent_idx", "sentence")
        .join(breaks.groupBy("doc_id").agg(
            F.sort_array(F.collect_set("bp")).alias("bps")),
            "doc_id", "left")
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sent_idx")
        sentences = list(pdf["sentence"])
        bps_val = pdf["bps"].iloc[0]
        bps = ([int(x) for x in bps_val]
               if bps_val is not None and hasattr(bps_val, "__iter__")
               else [])
        rows = rl.create_semantic_chunks(
            sentences, bps, min_chunk_size, max_chunk_size)
        return pd.DataFrame({
            "doc_id": [pdf["doc_id"].iloc[0]] * len(rows),
            "chunk_seq": list(range(len(rows))),
            "content": [r[0] for r in rows],
            "start_sentence": [r[1] for r in rows],
            "end_sentence": [r[2] for r in rows],
            "sentence_count": [r[2] - r[1] for r in rows],
        })

    assembled = per_doc.groupBy("doc_id").applyInPandas(
        assemble, schema=CHUNK_SCHEMA)
    return assembled.union(single)

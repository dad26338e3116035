"""Q1 — deterministic hash embeddings (the reference's no-GPU embedder).

Reference (vector/mod.rs:559-645 EmbeddingGenerator): a word's vector is
per-dimension hash(word, dim) mapped into [-1, 1] and L2-normalized; a
text's embedding is the per-occurrence mean of its words' vectors,
L2-normalized again.  We keep those semantics but swap Rust's
DefaultHasher for the repo-wide engine-portable h60 (md5 prefix), so the
oracle can reproduce values bit-for-bit.

Spark shape: everything is built-in expressions — a distinct-word
"vocabulary model" table crossed with a literal dim range, two
normalization aggregations, one join back to the token stream.  At
100 TB the vocabulary table is the small side (natural-language vocab
plateaus in the millions) and broadcast-joins the token stream; no
Python anywhere.

Word vectors are rounded to 8 dp before doc aggregation (pins the two
engines to identical inputs; final values round to 6 dp), matching the
oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.functions.hashing import h60


def hash_embeddings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """→ (id, dim, value): L2-normalized hash-TF embedding, long form.

    Long form keeps every step a plain groupBy and is join-ready for
    cosine scoring (pack with `pack_embeddings` when an array column is
    needed).  Duplicate word occurrences each contribute, as in the
    reference's mean-over-occurrences.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .alias("word"),
    ).filter(F.col("word") != "")
    n_words = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_words"))

    dims = F.explode(
        F.sequence(F.lit(0), F.lit(dim - 1))).alias("dim")
    raw = toks.select("word").distinct().select(
        "word", dims).select(
        "word", "dim",
        ((h60(F.concat_ws(":", F.col("word"), F.col("dim"))) % 2000
          - 1000) / 1000.0).alias("v"))
    norms = raw.groupBy("word").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    word_vecs = raw.join(norms, "word").select(
        "word", "dim",
        F.round(F.when(F.col("nrm") > 0, F.col("v") / F.col("nrm"))
                .otherwise(F.lit(0.0)), 8).alias("wv"))
    if broadcast_vocab:
        word_vecs = F.broadcast(word_vecs)

    summed = (
        toks.join(word_vecs, "word")
        .groupBy("id", "dim").agg(F.sum("wv").alias("s"))
        .join(n_words, "id")
        .select("id", "dim", (F.col("s") / F.col("n_words")).alias("m"))
    )
    doc_norm = summed.groupBy("id").agg(
        F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nrm"))
    return (
        summed.join(doc_norm, "id")
        .select("id", "dim",
                F.round(F.when(F.col("nrm") > 0, F.col("m") / F.col("nrm"))
                        .otherwise(F.lit(0.0)), 6).alias("value"))
    )


def pack_embeddings(long_form: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, dim, value) → (id, embedding array<double>) sorted by dim."""
    return long_form.groupBy(id_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "value"))),
            lambda s: s["value"]).alias("embedding"))

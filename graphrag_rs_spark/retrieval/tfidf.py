"""TF-IDF keyword extraction (reference text/keyword_extraction.rs:9-122).

tokenize → per-doc TF → corpus DF → Lucene IDF ln(N/df)+1 → top-k terms
per document by score — one explode, two aggregations, one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.retrieval.bm25 import tokenize


def tfidf_topk(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 5) -> DataFrame:
    """→ (doc_id, term, score, rank) — top-k terms per doc, 6-dp rounded.

    score = (tf / doc_len) · (ln(N/df) + 1); ties break on term asc.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.col(id_col)).distinct().count()

    scored = (
        tf.join(dl, "doc_id").join(F.broadcast(df_), "term")
        .select(
            "doc_id", "term",
            F.round(
                (F.col("tf") / F.col("doc_len"))
                * (F.log(F.lit(float(n_docs)) / F.col("df")) + 1.0), 6)
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k)

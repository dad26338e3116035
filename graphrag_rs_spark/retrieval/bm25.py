"""BM25 scoring as pure DataFrame aggregations (reference retrieval/bm25.rs).

The reference's single-node index (HashMaps of term→posting list,
bm25.rs:115-151) becomes three aggregations: term frequencies, document
frequencies, and a score join — Lucene IDF `ln(N/df) + 1` (bm25.rs:171-180)
and the k1/b term saturation formula (bm25.rs:182-188).

Tokenizer parity (bm25.rs:198-209): lowercase, strip punctuation, drop
tokens with length ≤ 2 and a small stoplist (bm25.rs:213-226).

Scale: DF/IDF is a broadcast-sized table (vocabulary); the score join
shuffles on term — uniform by construction after the stoplist removes the
head of the Zipf curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# reference stoplist, bm25.rs:213-226
STOPWORDS = (
    "the", "and", "for", "are", "but", "not", "you", "all", "can", "had",
    "her", "was", "one", "our", "out", "day", "get", "has", "him", "his",
    "how", "man", "new", "now", "old", "see", "two", "way", "who", "boy",
    "did", "its", "let", "put", "say", "she", "too", "use",
)

_TOKENIZE = ("filter(split(trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ')),"
             " ' '), x -> length(x) > 2)")


def tokenize(col: str) -> F.Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(F.expr(_TOKENIZE.format(c=col)),
                    lambda t: ~F.array_contains(stop, t))


def doc_terms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """→ (doc_id, term, tf, doc_len)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    return tf.join(dl, "doc_id")


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """→ (doc_id, score) for the top_k docs; score rounded to 6 dp.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
    idf(t) = ln(N/df) + 1 (Lucene variant, bm25.rs:171-180).
    """
    terms = doc_terms(docs, id_col, text_col)
    n_docs = docs.select(F.col(id_col)).distinct().count()
    stats = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    avgdl = terms.select("doc_id", "doc_len").distinct() \
        .agg(F.avg("doc_len").alias("avgdl")).collect()[0]["avgdl"] or 1.0

    q = F.array(*[F.lit(t) for t in query_terms])
    matched = terms.filter(F.array_contains(q, F.col("term"))) \
        .join(F.broadcast(stats), "term")
    idf = F.log(F.lit(float(n_docs)) / F.col("df")) + 1.0
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.lit(float(avgdl))))
    scored = matched.groupBy("doc_id").agg(
        F.round(F.sum(idf * tf_part), 6).alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )

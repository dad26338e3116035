"""Benchmark-contamination detection for training corpora.

The standard decontamination check before training on web-scale data:
flag corpus documents sharing word n-grams with an evaluation/benchmark
set (the public method used by GPT-3 §C / PaLM / Llama dataset cards,
typically with 8-13-gram overlap).

Shape at scale: the benchmark side is an eval suite — thousands of
documents, millions of n-grams at most — while the corpus is the 100 TB
side. Distinct benchmark n-gram hashes are therefore BROADCAST, and the
whole check is one map-side semi-join over the corpus scan: no shuffle
of corpus data at all. Above `broadcast_threshold` distinct benchmark
n-grams the hint is dropped and AQE picks the strategy.

No reference analogue (graphrag-rs indexes one trusted corpus); this is
part of the training-pipeline family the task brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.functions.hashing import h60, tokens, word_ngrams

# Above this many distinct benchmark n-grams, stop hinting broadcast and
# let AQE decide (≈ 8 bytes × 50M keys ≈ 400 MB hashed relation).
BROADCAST_MAX_NGRAMS = 50_000_000


def _ngram_hashes(df: DataFrame, id_col: str, text_col: str,
                  n: int) -> DataFrame:
    """→ (doc_id, gram_h): distinct h60 of each word n-gram per doc.

    Tokenization is materialized as its own projection BEFORE the
    per-position transform: inlined, the regexp-split chain re-evaluates
    inside every element_at of the lambda (n per position — measured 30×
    slower at sf0.1), same pitfall as textstats.fingerprints.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens(text_col).alias("toks"))
    return (base.select("doc_id",
                        F.explode(word_ngrams("toks", n)).alias("gram"))
            .select("doc_id", h60("gram").alias("gram_h"))
            .distinct())


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        n: int = 8,
                        broadcast_threshold: int = BROADCAST_MAX_NGRAMS,
                        ) -> DataFrame:
    """→ (doc_id, n_ngrams, n_contaminated, contamination_frac) per
    corpus doc; frac is over the doc's DISTINCT n-grams, rounded 6dp.

    Docs with fewer than n tokens have zero n-grams and report frac 0 —
    they cannot leak an n-gram they don't contain.
    """
    corpus_grams = _ngram_hashes(corpus, id_col, text_col, n)
    bench_grams = (_ngram_hashes(benchmark, bench_id_col, bench_text_col, n)
                   .select("gram_h").distinct()
                   .withColumn("_hit", F.lit(1)))
    if broadcast_threshold > 0:
        # The size probe is one eager job on the SMALL side (so building
        # this DataFrame runs a Spark job — callers printing plans pay
        # it once).  The checkpoint makes the probe count and the join
        # read ONE materialization instead of deriving the benchmark
        # gram set twice.  A guaranteed
        # broadcast hint on an oversized relation would OOM the driver,
        # so the hint is applied only under the cap (an explicit hint
        # can't be undone by AQE).
        # localCheckpoint, not persist: a per-call persist is never
        # unpersisted (leaked CacheManager entry); checkpoint storage is
        # freed by the ContextCleaner once the plan drops out of scope
        bench_grams = bench_grams.localCheckpoint(eager=True)
        if bench_grams.count() <= broadcast_threshold:
            bench_grams = F.broadcast(bench_grams)

    # one pass over the corpus grams: broadcast left join marks hits,
    # a single per-doc aggregate yields both the total and the hit count
    # (a separate left-semi + totals pass would scan the grams twice)
    marked = corpus_grams.join(bench_grams, "gram_h", "left")
    stats = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.count("_hit").alias("n_contaminated"))

    # left join from ALL corpus docs so n-gram-free docs still report
    all_docs = corpus.select(F.col(id_col).alias("doc_id")).distinct()
    return (all_docs
            .join(stats, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_ngrams", F.lit(0)).cast("bigint")
                .alias("n_ngrams"),
                F.coalesce("n_contaminated", F.lit(0)).cast("bigint")
                .alias("n_contaminated"),
                F.round(F.coalesce("n_contaminated", F.lit(0))
                        / F.greatest(F.coalesce("n_ngrams", F.lit(0)),
                                     F.lit(1)), 6)
                .alias("contamination_frac")))

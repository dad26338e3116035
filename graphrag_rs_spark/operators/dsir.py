"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
score every raw document by how much more likely its hashed n-gram
features are under a small TARGET corpus (the domain you want more of)
than under the RAW corpus it came from, then resample with Gumbel-top-k
on the importance weights.  This is the standard cheap alternative to a
trained domain classifier for steering a 100 TB crawl toward a target
mixture.

  dsir_log_ratio — dense per-bucket log-likelihood ratio table:
                   unigrams+bigrams hashed into `num_buckets` buckets,
                   add-alpha smoothed bag-of-buckets models p (target)
                   and q (raw); log_ratio_b = ln p_b − ln q_b.  Two
                   corpus scans aggregating to ≤num_buckets rows each —
                   the only passes over the data.
  dsir_weights   — per-doc importance weight: one explode of the doc's
                   n-grams, broadcast join against the (≤num_buckets)
                   ratio table, one sum per doc.  log_w(x) = Σ_features
                   log_ratio[bucket(f)].
  dsir_select    — Gumbel-top-k resampling made deterministic: the
                   Gumbel draw g = −ln(−ln(u)) uses the engine-portable
                   md5 hash bucket as u, so the same corpus always
                   yields the same sample on any cluster size and the
                   DuckDB oracle replays the exact selection.

Scale shape: the ratio table is fixed-size (num_buckets rows, ~100 KB at
the default 10k) and broadcast; the corpus sees exactly one tokenize +
explode + hash-agg per scoring pass — no shuffle wider than the per-doc
sum, nothing quadratic, no driver state.  Skewed buckets (stopword
n-grams) only skew the *count* aggregation, which partial-aggregates
map-side.

Cross-engine determinism: buckets use the shared 60-bit md5 prefix
(functions/hashing.h60), ln/Σ stay raw until the output boundary, and
every emitted float is rounded to 6 dp BEFORE any ranking/limit (repo
invariant, __spark_entry__.py header) with doc_id tie-breaks.

Reference scope note: graphrag-rs is a single-corpus KG indexer with no
data-selection subsystem; this operator is part of the engine-added
training-data curation family the task brief mandates alongside
SURVEY.md §2 (same footing as dedup/sampling/mixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import h60, word_ngrams
from graphrag_rs_spark.operators.sampling import RESOLUTION, hash_bucket

NUM_BUCKETS = 10_000
ROUND_DP = 6


def _feature_buckets(docs: DataFrame, id_col: str, text_col: str,
                     num_buckets: int, seed: str) -> DataFrame:
    """→ (doc_id, bucket), one row per unigram/bigram OCCURRENCE.

    Unigrams and bigrams concat into one array before the single explode
    (one generator, one scan).  The token array is materialized in its
    own projection first — inlining tokenization into word_ngrams'
    lambda re-evaluates the regex per position (hashing.word_ngrams
    docstring; measured 30× at sf0.1).
    """
    from graphrag_rs_spark.operators.textstats import _TOKENIZE

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_TOKENIZE.format(c=text_col)).alias("toks"))
    grams = toks.select(
        "doc_id",
        F.explode(F.concat(F.col("toks"), word_ngrams("toks", 2)))
        .alias("gram"))
    return grams.select(
        "doc_id",
        (h60(F.concat(F.lit(f"{seed}:"), F.col("gram")))
         % F.lit(num_buckets)).cast("bigint").alias("bucket"))


def _bucket_counts(docs: DataFrame, id_col: str, text_col: str,
                   num_buckets: int, seed: str) -> DataFrame:
    """→ (bucket, cnt) hash-aggregated to ≤num_buckets rows."""
    return (_feature_buckets(docs, id_col, text_col, num_buckets, seed)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def dsir_log_ratio(target_docs: DataFrame, raw_docs: DataFrame,
                   num_buckets: int = NUM_BUCKETS, alpha: float = 1.0,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: str = "dsir") -> DataFrame:
    """→ dense (bucket, log_ratio) over ALL num_buckets buckets.

    log_ratio_b = ln((c_target_b + α)/(T_target + α·B))
                − ln((c_raw_b    + α)/(T_raw    + α·B))

    Dense (every bucket present, zero counts included via the range
    frame) so scoring is a plain inner join with no absent-key special
    case — at 10k rows the table broadcasts everywhere.  log_ratio stays
    unrounded; rounding happens once at the weight boundary.
    """
    spark = target_docs.sparkSession
    tc = _bucket_counts(target_docs, id_col, text_col, num_buckets, seed)
    rc = _bucket_counts(raw_docs, id_col, text_col, num_buckets, seed)
    dense = spark.range(num_buckets).select(
        F.col("id").cast("bigint").alias("bucket"))
    joined = (
        dense
        .join(tc.withColumnRenamed("cnt", "t_cnt"), "bucket", "left")
        .join(rc.withColumnRenamed("cnt", "r_cnt"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
            F.sum(F.coalesce("t_cnt", F.lit(0)))
            .over(Window.partitionBy()).alias("t_tot"),
            F.sum(F.coalesce("r_cnt", F.lit(0)))
            .over(Window.partitionBy()).alias("r_tot"),
        ))
    a, b = F.lit(float(alpha)), F.lit(float(alpha * num_buckets))
    return joined.select(
        "bucket",
        (F.log((F.col("t_cnt") + a) / (F.col("t_tot") + b))
         - F.log((F.col("r_cnt") + a) / (F.col("r_tot") + b)))
        .alias("log_ratio"))


def dsir_weights(docs: DataFrame, log_ratio: DataFrame,
                 num_buckets: int = NUM_BUCKETS,
                 id_col: str = "doc_id", text_col: str = "text",
                 seed: str = "dsir") -> DataFrame:
    """→ (doc_id, n_features, log_w) for every input doc.

    log_w = Σ over the doc's n-gram occurrences of log_ratio[bucket];
    docs with zero features (empty after normalization) get log_w = 0.0
    and n_features = 0 rather than dropping out — curation must see
    every id it was handed.  log_w rounded to 6 dp at this boundary so
    every downstream ranking (dsir_select, user top-k) orders on the
    cross-engine-stable value.
    """
    fb = _feature_buckets(docs, id_col, text_col, num_buckets, seed)
    per_doc = (
        fb.join(F.broadcast(log_ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_features"),
             F.sum("log_ratio").alias("_lw")))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_features", F.lit(0)).cast("bigint")
            .alias("n_features"),
            F.round(F.coalesce("_lw", F.lit(0.0)), ROUND_DP)
            .alias("log_w")))


def dsir_select(weights: DataFrame, k: int,
                seed: str = "dsir-gumbel") -> DataFrame:
    """Gumbel-top-k resampling over importance weights, deterministic.

    The paper resamples with probability ∝ w(x); Gumbel-top-k realizes
    that draw as rank(log_w + g) with g ~ Gumbel(0,1).  Here
    u = (hash_bucket(doc_id) + 0.5)/RESOLUTION (strictly inside (0,1)),
    g = −ln(−ln(u)) — a pure function of (seed, doc_id), so the sample
    is reproducible at any parallelism and SQL-replayable.  The Gumbel
    key is rounded to 6 dp BEFORE the rank (repo invariant), doc_id
    tie-break.  → (doc_id, log_w, gumbel_key, rank), rank ≤ k.
    Scale shape: orderBy().limit(k) lowers to TakeOrderedAndProject —
    per-partition top-k then a k-row merge, never a single-partition
    global window; the rank column is assigned on the ≤k survivors.
    """
    u = (hash_bucket("doc_id", seed) + F.lit(0.5)) / F.lit(float(RESOLUTION))
    key = F.round(F.col("log_w") - F.log(-F.log(u)), ROUND_DP)
    top = (weights
           .select("doc_id", "log_w", key.alias("gumbel_key"))
           .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
           .limit(k))
    win = Window.orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(win))

"""Hashed logistic-regression quality classifier for corpus filtering.

The canonical model-based filtering step of web-scale training-data
pipelines (GPT-3, Brown et al. 2020 appendix A; CCNet, Wenzek et al.
2020): train a linear classifier on hashed bag-of-words features with a
small labeled set (curated corpus = positive, raw crawl = negative),
then score every crawl document and keep the high-probability ones.
fastText is the usual single-node tool; this is the same model family
(bag-of-hashed-features + linear head) trained as pure Spark dataflow.

  doc_features             — (doc_id, bucket, x): binary md5-hashed
                             set-of-words features (fastText-style
                             presence bag).
  train_quality_classifier — full-batch gradient descent on logistic
                             loss, `iters` synchronous iterations.  One
                             weights table (num_buckets rows + bias) is
                             broadcast per iteration; the corpus sees
                             one join + two keyed aggs per iteration.
                             Weights, probabilities and gradients are
                             rounded to 12 dp at each boundary, making
                             the trajectory independent of partition/
                             addition order and replayable in SQL (the
                             pagerank unrolled-iteration oracle pattern).
  score_quality            — broadcast-join the trained model back onto
                             any corpus: (doc_id, score, pred).

Scale shape: the model is fixed-size (num_buckets+1 rows — broadcast
everywhere); per iteration the corpus is scanned once (features are
computed once and should be persisted/checkpointed by the caller for
multi-iteration training), every shuffle keys on doc_id or bucket, and
the synchronous-iteration barrier is inherent to full-batch GD (same
posture as pagerank's power iterations).  Nothing is quadratic; no
driver-side data movement (the model never leaves the cluster).

Reference scope note: graphrag-rs has no model-based corpus filtering
(its quality signals are heuristic, entity/mod.rs confidence scoring);
this operator is part of the engine-added training-data curation family
the task brief mandates alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.functions.hashing import h60

NUM_BUCKETS = 1024
TRAJ_DP = 9    # per-iteration boundary rounding: coarse enough that a
               # few-ULP exp()/summation-order difference between engines
               # can essentially never flip a rounding (spacing 1e-9 vs
               # ~1e-15 drift), fine enough to not perturb training
ROUND_DP = 6   # output boundary

BIAS_BUCKET = -1  # the bias term rides the weights table at bucket -1


def doc_features(docs: DataFrame, num_buckets: int = NUM_BUCKETS,
                 id_col: str = "doc_id", text_col: str = "text",
                 seed: str = "qc") -> DataFrame:
    """→ (doc_id, bucket, x): binary hashed set-of-words features.

    x_{d,b} = 1.0 iff any of doc d's tokens hashes to bucket b — the
    fastText-style presence bag.  Presence (vs tf) keeps each feature's
    gradient O(class prevalence of the feature) rather than O(1/doc
    length), so a handful of full-batch GD iterations already separates
    marker vocabularies; each active feature contributes a bounded ±w_b
    to the margin.  Docs that are empty after tokenization emit no rows
    (their margin is the bias alone; trainer and scorer left-join to
    keep them).
    """
    from graphrag_rs_spark.operators.textstats import _TOKENIZE

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_TOKENIZE.format(c=text_col)).alias("toks"))
    return (toks
            .select("doc_id", F.explode("toks").alias("tok"))
            .select(
                "doc_id",
                (h60(F.concat(F.lit(f"{seed}:"), F.col("tok")))
                 % F.lit(num_buckets)).cast("bigint").alias("bucket"))
            .distinct()
            .withColumn("x", F.lit(1.0)))


def _margins(feats: DataFrame, labeled: DataFrame,
             weights: DataFrame) -> DataFrame:
    """→ (doc_id, y, p): current-model probability per labeled doc.

    weights is model-sized and broadcast; featureless docs keep the
    bias-only margin via the left join.  p is rounded to TRAJ_DP so the
    trajectory is identical across engines and partitionings.
    """
    w = F.broadcast(weights.filter(F.col("bucket") != BIAS_BUCKET))
    bias = F.broadcast(
        weights.filter(F.col("bucket") == BIAS_BUCKET)
        .select(F.col("weight").alias("bias")))
    dot = (feats.join(w, "bucket")
           .groupBy("doc_id")
           .agg(F.sum(F.col("x") * F.col("weight")).alias("dot")))
    return (labeled.join(dot, "doc_id", "left").crossJoin(bias)
            .select(
                "doc_id", "y",
                F.round(
                    F.lit(1.0) /
                    (F.lit(1.0) + F.exp(-(F.coalesce("dot", F.lit(0.0))
                                          + F.col("bias")))),
                    TRAJ_DP).alias("p")))


def train_quality_classifier(
    docs: DataFrame,
    label_col: str = "y",
    num_buckets: int = NUM_BUCKETS,
    iters: int = 3,
    lr: float = 5.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "qc",
) -> DataFrame:
    """→ (bucket, weight): trained model, bias at bucket = BIAS_BUCKET.

    Full-batch logistic-loss gradient descent from w = 0:
      p_d   = σ(bias + Σ_b w_b·x_{d,b})           (rounded TRAJ_DP)
      g_b   = Σ_d (p_d − y_d)·x_{d,b} / N          (rounded TRAJ_DP)
      w_b  ← w_b − lr·g_b                          (rounded TRAJ_DP)
    The weights table is dense over all buckets (zero rows included) so
    every iteration's join is a plain inner join; it is localCheckpointed
    each iteration (model-sized — num_buckets+1 rows) to keep the plan
    flat across iterations, pagerank-style.
    """
    spark = docs.sparkSession
    feats = doc_features(docs, num_buckets, id_col, text_col, seed) \
        .localCheckpoint()  # scanned once per iteration: materialize once
    labeled = docs.select(F.col(id_col).alias("doc_id"),
                          F.col(label_col).cast("double").alias("y")) \
        .localCheckpoint()
    n_docs = labeled.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n"))

    weights = (spark.range(-1, num_buckets)
               .select(F.col("id").cast("bigint").alias("bucket"),
                       F.lit(0.0).alias("weight"))
               .localCheckpoint())
    for _ in range(iters):
        resid = _margins(feats, labeled, weights) \
            .select("doc_id", (F.col("p") - F.col("y")).alias("r"))
        g_feat = (feats.join(resid, "doc_id")
                  .groupBy("bucket")
                  .agg(F.sum(F.col("r") * F.col("x")).alias("gs")))
        g_bias = resid.groupBy().agg(F.sum("r").alias("gs")) \
            .select(F.lit(BIAS_BUCKET).cast("bigint").alias("bucket"), "gs")
        grad = (g_feat.unionByName(g_bias).crossJoin(F.broadcast(n_docs))
                .select("bucket",
                        F.round(F.col("gs") / F.col("n"), TRAJ_DP)
                        .alias("g")))
        weights = (weights.join(grad, "bucket", "left")
                   .select("bucket",
                           F.round(F.col("weight")
                                   - F.lit(lr) * F.coalesce("g", F.lit(0.0)),
                                   TRAJ_DP).alias("weight"))
                   .localCheckpoint())
    return weights


def score_quality(docs: DataFrame, model: DataFrame,
                  num_buckets: int = NUM_BUCKETS,
                  id_col: str = "doc_id", text_col: str = "text",
                  seed: str = "qc",
                  threshold: float = 0.5) -> DataFrame:
    """→ (doc_id, score, pred): model probability per doc, 6-dp rounded
    BEFORE the threshold (repo invariant), pred = score ≥ threshold.

    One feature pass + one broadcast join — the inference path a 100 TB
    crawl actually runs; the model table is num_buckets+1 rows.
    """
    feats = doc_features(docs, num_buckets, id_col, text_col, seed)
    ids = docs.select(F.col(id_col).alias("doc_id"))
    scored = _margins(feats, ids.withColumn("y", F.lit(0.0)), model)
    return scored.select(
        "doc_id",
        F.round("p", ROUND_DP).alias("score"),
        (F.round("p", ROUND_DP) >= F.lit(threshold)).cast("int")
        .alias("pred"))

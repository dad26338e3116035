"""Confidence cross-encoder reranking (reranking/cross_encoder.rs).

The reference's ConfidenceCrossEncoder (:93-205) is a heuristic
cross-encoder: relevance = token-set Jaccard(query, doc) * 0.7 +
min(doc_tokens/100, 1) * 0.3, optionally squashed through a sigmoid
(:140-145), then sort desc -> retain >= min_confidence -> top-k.  It
scores one (query, doc) pair at a time on the driver; here a whole
candidate table is scored in ONE narrow Catalyst projection (the
query's token set is baked into the plan as an array literal — same
pattern as rograg/fuzzy_matcher), so reranking any number of
candidates is an embarrassingly-parallel map plus one global top-k.

Quirks preserved:
- token sets from `split_whitespace` (duplicates collapse for the
  Jaccard, but length_factor counts RAW tokens, :133);
- empty query or doc tokens -> 0.0 (:108-110);
- retain-then-truncate order (:186-190): the confidence filter runs
  BEFORE top-k truncation.

Documented divergences: f64 for f32; ranking on the 6-dp-rounded
score with id tie-break (reference sort_by partial_cmp ties are
nondeterministic); the sigmoid normalization (normalize_scores=True,
the reference default) calls exp(), whose last-ulp behavior differs
between JVM and C libm — it is STRICTLY MONOTONIC, so ranking,
filtering (threshold transformed once in Python) and top-k are
identical either way; the DuckDB contract query therefore runs the
raw path and the sigmoid is pytest-verified (never hash-compared
across engines — repo float rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cross_encoder_rerank(
    candidates: DataFrame,
    query: str,
    id_col: str = "id",
    content_col: str = "content",
    score_col: str = "score",
    top_k: int = 10,
    min_confidence: float = 0.0,
    normalize: bool = True,
) -> DataFrame:
    """→ (id, relevance, original, delta) — reranking/cross_encoder.rs
    :154-205 batched; deterministic (relevance desc, id asc) top-k."""
    qset = sorted(set(query.split()))
    qarr = F.array(*[F.lit(w) for w in qset])
    # \s+ (split_whitespace parity, module contract) — a literal-space
    # split under-scored any multi-line/tab-containing candidate
    toks = F.filter(F.split(F.col(content_col), r"\s+"),
                    lambda x: x != "")
    dset = F.array_distinct(toks)
    inter = F.size(F.array_intersect(dset, qarr))
    union = F.lit(len(qset)) + F.size(dset) - inter
    jaccard = F.when(union > 0,
                     inter.cast("double") / union).otherwise(F.lit(0.0))
    length_factor = F.least(F.size(toks) / 100.0, F.lit(1.0))
    raw = jaccard * 0.7 + length_factor * 0.3
    if len(qset) == 0:
        raw = F.lit(0.0)
    relevance = F.when(F.size(toks) == 0, 0.0).otherwise(raw)
    if normalize:
        relevance = 1.0 / (1.0 + F.exp(-5.0 * (relevance - 0.5)))
    out = candidates.select(
        F.col(id_col).alias("id"),
        F.round(relevance, 6).alias("relevance"),
        F.round(F.col(score_col).cast("double"), 6).alias("original"),
        F.round(relevance - F.col(score_col).cast("double"), 6)
        .alias("delta"))
    return (out.filter(F.col("relevance") >= min_confidence)
            .orderBy(F.desc("relevance"), "id")
            .limit(top_k))


def reranking_stats(
    original_count: int,
    ranked: DataFrame,
) -> DataFrame:
    """RerankingStats::from_results (:233-267) as one aggregate row.
    Deltas are summed as exact micro-unit BIGINTs (order-independent;
    a double sum can straddle a 6-dp rounding boundary between
    engines), then divided once."""
    micro = F.round(F.col("delta") * 1000000.0).cast("bigint")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum(micro), F.lit(0)).alias("_dsum"),
        F.max("delta").alias("_dmax"))
    n = F.col("_n")
    return agg.select(
        F.lit(original_count).alias("candidates_count"),
        n.cast("int").alias("results_count"),
        F.round(F.when(n > 0,
                       (F.col("_dsum").cast("double") / 1000000.0) / n)
                .otherwise(0.0), 6).alias("avg_improvement"),
        F.round(F.coalesce(F.col("_dmax"), F.lit(0.0)), 6)
        .alias("max_improvement"),
        F.round(F.when(F.lit(original_count) > 0,
                       (original_count - n).cast("double")
                       / original_count * 100.0)
                .otherwise(0.0), 6).alias("filter_rate"))

"""QA answer-quality evaluation (monitoring/benchmark.rs:322-443).

The reference's benchmark harness scores one generated answer at a
time against its ground truth: exact match (case-insensitive trimmed
equality, :325-329) and a token-overlap F1 (:341-380), then averages
over the dataset (:383-441).  The latency/token-cost fields around
them are simulation stubs (TODO-filled) and stay out of scope; the
quality kernel is the part a training-data pipeline needs — scoring
millions of (generated, reference) pairs is a narrow map plus one
aggregate.

F1 quirk preserved (:355-362): `common` iterates the GENERATED tokens
WITH duplicates and counts each one that appears anywhere in the
ground-truth list — a generated answer repeating one correct token n
times gets common = n, so precision can reach 1.0 on degenerate
repetition.  Zero common → 0.0 early (before the 2pr/(p+r) division).

Averages sum per-row 6-dp-rounded scores as exact micro-unit BIGINTs
(order-independent across engines/partitionings — a double sum can
straddle a rounding boundary).  f64 for f32, documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def qa_quality(
    pairs: DataFrame,
    id_col: str = "id",
    generated_col: str = "generated",
    truth_col: str = "ground_truth",
) -> DataFrame:
    """→ (id, exact_match, f1) per pair — benchmark.rs:322-380."""
    gen, gt = F.col(generated_col), F.col(truth_col)
    em = (F.lower(F.trim(gen)) == F.lower(F.trim(gt))).cast("int")
    # \s+ (benchmark.rs split_whitespace parity): multi-line generated
    # answers — the normal LLM output shape — must tokenize correctly
    gtoks = F.filter(F.split(F.lower(gen), r"\s+"), lambda x: x != "")
    ttoks = F.filter(F.split(F.lower(gt), r"\s+"), lambda x: x != "")
    common = F.size(F.filter(gtoks,
                             lambda t: F.array_contains(ttoks, t)))
    p = common.cast("double") / F.size(gtoks)
    r = common.cast("double") / F.size(ttoks)
    f1 = F.when((F.size(gtoks) == 0) | (F.size(ttoks) == 0), 0.0) \
        .when(common == 0, 0.0) \
        .otherwise(2.0 * (p * r) / (p + r))
    return pairs.select(
        F.col(id_col).alias("id"),
        em.alias("exact_match"),
        F.round(f1, 6).alias("f1"))


def qa_summary(scored: DataFrame) -> DataFrame:
    """→ one row (total_queries, avg_exact_match, avg_f1) —
    benchmark.rs:383-441, micro-int order-independent sums."""
    micro = F.round(F.col("f1") * 1000000.0).cast("bigint")
    agg = scored.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("exact_match").alias("_em"),
        F.coalesce(F.sum(micro), F.lit(0)).alias("_f1m"))
    n = F.col("_n")
    return agg.select(
        n.cast("int").alias("total_queries"),
        F.round(F.when(n > 0, F.col("_em").cast("double") / n)
                .otherwise(0.0), 6).alias("avg_exact_match"),
        F.round(F.when(n > 0,
                       (F.col("_f1m").cast("double") / 1000000.0) / n)
                .otherwise(0.0), 6).alias("avg_f1"))

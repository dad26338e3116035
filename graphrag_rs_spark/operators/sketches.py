"""Distinct-count sketches for corpus profiling at 100 TB.

Exact ``COUNT(DISTINCT token)`` over a web-scale corpus shuffles every
distinct value; a KMV (k-minimum-values) sketch answers the same
question from the k smallest hash values per group — a bounded-size
state that merges associatively, so the whole computation is one
map-side-combinable aggregation.

Determinism contract (same as the rest of the engine): the hash is
``h60`` (md5-prefix bigint), so the sketch — and therefore the
ESTIMATE itself — is bit-identical across engines and parallelism
levels, and the DuckDB oracle replays it exactly (unlike Spark's
``approx_count_distinct`` HLL, whose estimate is engine-private).

Estimator (Bar-Yossef et al. 2002): with U(v) = (h60(v)+1)/2^60 ∈ (0,1]
uniform, and u_k the k-th smallest distinct hash of a group:
  distinct ≈ (k-1)/u_k        when the group has ≥ k distinct values
  distinct  = n (exact)       when it has n < k (the sketch holds all)
Standard error ≈ 1/sqrt(k-2) — k=256 gives ~6%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import h60

_TWO60 = float(2 ** 60)


def kmv_distinct_by(values: DataFrame, group_col: str, value_col: str,
                    k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate from a KMV sketch.

    → (group_col, n_kept:int, est_distinct:double) — ``n_kept`` is the
    sketch fill (min(k, true distinct)); ``est_distinct`` is rounded to
    4 dp so ranking/compare happen on the exported value.

    Plan: distinct (map-side combinable agg) → per-group bottom-k window
    on the 60-bit hash → one agg.  Sketch state is ≤ k rows per group at
    every point after the distinct, so the only full-width shuffle is
    the distinct itself — at true 100 TB scale swap the exact distinct
    for a pre-agg on (group, h) which is the same exchange; duplicate
    hashes collapse identically either way.
    """
    if k < 3:
        raise ValueError("k must be ≥ 3 for the (k-1)/u_k estimator")
    hashed = (
        values.select(F.col(group_col).alias("g"),
                      h60(F.col(value_col).cast("string")).alias("h"))
        # null values hash to null, which sorts FIRST ascending and
        # would occupy a sketch slot — a null is not a value; drop it
        .filter(F.col("h").isNotNull())
        .groupBy("g", "h").agg(F.lit(1).alias("_one")).drop("_one"))
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") <= int(k))
    est = F.when(
        F.col("n_kept") < int(k),
        F.col("n_kept").cast("double"),
    ).otherwise((F.lit(float(k - 1)))
                / ((F.col("u_k") + 1.0) / F.lit(_TWO60)))
    return (
        kept.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.max("h").alias("u_k"))
        .select(F.col("g").alias(group_col), "n_kept",
                F.round(est, 4).alias("est_distinct"))
    )


def kmv_distinct(values: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Global distinct-count estimate → 1 row (n_kept, est_distinct)."""
    one = values.select(F.lit(0).alias("_g"),
                        F.col(value_col).alias(value_col))
    return kmv_distinct_by(one, "_g", value_col, k).drop("_g")

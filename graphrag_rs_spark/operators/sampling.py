"""Deterministic sampling and split assignment for training-data pipelines.

Reproducibility ops a 100 TB corpus pipeline needs: every draw is a pure
function of (seed, key) — no RNG state, no partition-order dependence, no
driver coordination — so the same corpus always yields the same sample on
any cluster size, and an ANSI-SQL engine (the DuckDB oracle) replays the
exact assignment.

  hash_bucket          — key → uniform bucket in [0, resolution)
  deterministic_sample — keep keys whose bucket falls under fraction
  hash_split           — train/val/test assignment by cumulative bucket
                         thresholds; key-stable (every row of a key lands
                         in the same split, preventing leakage of
                         near-identical rows across splits)
  stratified_sample    — per-stratum fractions (e.g. per-language caps)

All pure Catalyst expressions (md5 → 60-bit bigint → mod), JVM-side,
codegen-friendly; scan-level column pruning and filter pushdown apply.
At 100 TB this is a single map-side filter/projection — no shuffle at all.

Reference parity note: graphrag-rs has no sampling subsystem (single-node,
whole-corpus indexing); these are the training-pipeline extensions the task
brief mandates alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from graphrag_rs_spark.functions.hashing import h60

# One million buckets → split fractions are exact to 1e-6, far below the
# sampling noise at any corpus size worth splitting.
RESOLUTION = 1_000_000


def hash_bucket(key: Column | str, seed: str,
                resolution: int = RESOLUTION) -> Column:
    """Uniform bucket in [0, resolution) as a pure function of (seed, key).

    h60 is a 60-bit non-negative md5 prefix, so plain `%` matches ANSI SQL
    `%` with no sign games. The seed is prefixed (not appended) so distinct
    seeds decorrelate even for keys that are each other's prefixes.
    """
    k = F.col(key) if isinstance(key, str) else key
    return (h60(F.concat(F.lit(f"{seed}:"), k.cast("string")))
            % F.lit(resolution)).cast("bigint")


def deterministic_sample(df: DataFrame, key: str, fraction: float,
                         seed: str = "sample") -> DataFrame:
    """Keep rows whose key-bucket < fraction·resolution.

    Key-stable: resampling with a larger fraction is a superset of the
    smaller one (nested samples), and re-running on a grown corpus keeps
    every previously sampled key — the property incremental training-data
    refreshes need.
    """
    threshold = int(round(fraction * RESOLUTION))
    return df.where(hash_bucket(key, seed) < F.lit(threshold))


def hash_split(df: DataFrame, key: str,
               weights: dict[str, float] | None = None,
               seed: str = "split",
               out_col: str = "split") -> DataFrame:
    """Assign each row to a named split by cumulative bucket thresholds.

    weights must sum to ~1; iteration order of the dict fixes the bucket
    ranges (train gets the lowest buckets by default). Every row sharing a
    key gets the same split, so near-duplicate rows of one conversation or
    document can never straddle train/test.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    bucket = hash_bucket(key, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < F.lit(int(round(cum * RESOLUTION)))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, strata: str, key: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      seed: str = "strat") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language-balanced corpora).

    fractions maps stratum value → keep fraction; strata absent from the
    map use default_fraction. The threshold is a when-chain over the
    (small, fixed) fraction map — a pure projection, no join, no shuffle.
    """
    bucket = hash_bucket(key, seed)
    thr = None
    for value, frac in fractions.items():
        cond = F.col(strata) == F.lit(value)
        t = F.lit(int(round(frac * RESOLUTION)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = F.lit(int(round(default_fraction * RESOLUTION)))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return df.where(bucket < thr)


def sample_token_budget(df: DataFrame, key: str, weight_col: str,
                        budget: int, seed: str = "budget",
                        out_bucket: str = "bucket") -> DataFrame:
    """Deterministic prefix sample up to a total token budget.

    Semantics: order all rows by (hash_bucket(key), key) and keep the
    longest prefix whose running `weight_col` sum stays ≤ budget — the
    draw every "sample N tokens for this ablation" request needs, exactly
    reproducible on any cluster size and replayable as one ANSI window
    cumsum (the DuckDB oracle).

    Scale shape — NO global sort of the corpus:
      1. per-bucket weight totals: one hash agg to ≤ RESOLUTION rows
         (bounded by bucket count, NOT corpus size),
      2. running total over that bounded summary (single-partition
         window over ≤1e6 rows — fixed cost at any scale),
      3. the two resulting scalars (boundary bucket, budget already
         spent before it) broadcast back: buckets below the boundary
         keep every row with a map-side filter; ONLY the one boundary
         bucket (≈ corpus_size/RESOLUTION rows) runs an intra-bucket
         ordered cumsum.
    Equivalent to the naive global-ordering definition row-for-row.
    """
    from pyspark.sql import Window

    b = df.withColumn(out_bucket, hash_bucket(key, seed))
    totals = b.groupBy(out_bucket).agg(
        F.sum(weight_col).alias("_bw"))
    win = Window.orderBy(out_bucket).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = totals.withColumn("_cum", F.sum("_bw").over(win))
    # boundary = first bucket whose cumulative total exceeds the budget;
    # everything before it fits entirely within the budget
    boundary = cum.where(F.col("_cum") > budget).agg(
        F.min(out_bucket).alias("_bb"),
        F.min_by(F.col("_cum") - F.col("_bw"), out_bucket).alias("_spent"))
    marked = b.join(F.broadcast(boundary), how="cross")
    full = marked.where(F.col("_bb").isNull()
                        | (F.col(out_bucket) < F.col("_bb")))
    edge = marked.where(F.col(out_bucket) == F.col("_bb"))
    ewin = Window.partitionBy(out_bucket).orderBy(F.col(key)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    edge_kept = (edge
                 .withColumn("_ecum", F.sum(weight_col).over(ewin))
                 .where(F.col("_spent") + F.col("_ecum") <= budget)
                 .drop("_ecum"))
    return full.unionByName(edge_kept).drop("_bb", "_spent")

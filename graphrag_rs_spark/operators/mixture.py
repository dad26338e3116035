"""Domain-mixture planning and realization for training corpora.

Training runs quote a token budget and a target domain mixture ("30%
web, 25% code, ..."); curation must turn that into per-source sampling
rates against what is actually available, then realize the mix as a
deterministic up/down-sampled corpus:

  mixture_plan     — per-source available tokens joined with target
                     shares → epochs (pass count) per source, capped at
                     `max_epochs` so a scarce domain can't be repeated
                     into degeneracy (the Muennighoff et al. 2023 "data-
                     constrained scaling" guardrail: ~4 epochs is where
                     repeated data stops paying)
  realize_mixture  — docs × plan → one output row per (doc, copy):
                     floor(epochs) whole passes plus one extra pass for
                     the deterministic hash-fraction of keys matching
                     the fractional part.  Key-stable like every sampler
                     here: growing the corpus or re-running never flips
                     a previously emitted copy.

Scale shape: the plan is one groupBy(source) agg (≤ #sources rows, KBs);
realization broadcast-joins that tiny plan back on source and explodes
`sequence(1, n_copies)` — no shuffle of the corpus at all beyond the
scan, so the op runs at scan speed on 100 TB.  Oversampling multiplies
output rows per input row (bounded by max_epochs), which parquet sinks
absorb; downstream packing reshuffles anyway.

Reference parity note: graphrag-rs is single-corpus with no mixture
subsystem; this is a training-pipeline extension mandated by the task
brief alongside SURVEY.md §2 (same footing as dedup/sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.operators.sampling import RESOLUTION, hash_bucket
from graphrag_rs_spark.operators.textstats import token_stats


def mixture_plan(docs: DataFrame, targets: dict[str, float],
                 token_budget: int, max_epochs: float = 4.0,
                 id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source") -> DataFrame:
    """→ (source, available_tokens, target_share, desired_tokens, epochs).

    target_share is normalized over the sources PRESENT in both the
    corpus and `targets` (a target for an absent source redistributes to
    the rest — the standard mixture-solver behavior when a domain is
    missing from a crawl).  epochs = desired/available capped at
    max_epochs, rounded to 6 dp before any consumer ranks on it.
    """
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        sorted(targets.items()), "source string, raw_share double")
    avail = (
        token_stats(docs, id_col=id_col, text_col=text_col,
                    keep=(source_col,))
        .groupBy(F.col(source_col).alias("source"))
        .agg(F.sum("n_word_tokens").alias("available_tokens"))
    )
    joined = avail.join(F.broadcast(tgt), "source")
    # normalization constant as an unpartitioned window over the joined
    # frame (≤ #sources rows) — keeps the plan one lazy job, no driver
    # round-trip
    # Guarded divisions: Spark 4 runs ANSI mode by default, so a plain
    # `/` on a zero denominator aborts the job instead of yielding null.
    # Zero denominators are reachable — a source whose docs all tokenize
    # to nothing (all-punctuation / non-Latin text) has
    # available_tokens = 0, and all-zero raw_shares make total_share 0.
    total_share = F.sum("raw_share").over(Window.partitionBy())
    share = F.when(total_share > 0, F.col("raw_share") / total_share) \
             .otherwise(F.lit(0.0))
    desired = share * F.lit(float(token_budget))
    epochs = F.when(
        F.col("available_tokens") > 0,
        F.least(desired / F.col("available_tokens"),
                F.lit(float(max_epochs)))).otherwise(F.lit(0.0))
    return (
        joined.select(
            "source",
            "available_tokens",
            F.round(share, 6).alias("target_share"),
            F.round(desired, 6).alias("desired_tokens"),
            F.round(epochs, 6).alias("epochs"),
        )
        .orderBy("source")
    )


def realize_mixture(docs: DataFrame, plan: DataFrame,
                    seed: str = "mixture", id_col: str = "doc_id",
                    source_col: str = "source") -> DataFrame:
    """docs × plan → (doc_id, source, copy_idx), one row per emitted copy.

    n_copies(doc) = floor(epochs) + [hash_bucket(doc) < frac(epochs)·R]
    so exactly the hash-chosen fraction of each source's keys gets the
    extra pass; expected emitted tokens per source = epochs · available.
    Sources absent from the plan emit nothing (epochs 0 = dropped).
    """
    frac = F.col("epochs") - F.floor(F.col("epochs"))
    threshold = F.round(frac * RESOLUTION).cast("bigint")
    n_copies = (
        F.floor(F.col("epochs")).cast("int")
        + F.when(hash_bucket(id_col, seed) < threshold, 1).otherwise(0)
    )
    plan_side = plan.select(F.col("source").alias("_plan_source"), "epochs")
    return (
        docs.join(F.broadcast(plan_side),
                  F.col(source_col) == F.col("_plan_source"))
        .select(F.col(id_col).alias("doc_id"),
                F.col(source_col).alias("source"),
                n_copies.alias("_n"))
        .where(F.col("_n") > 0)
        .select("doc_id", "source",
                F.explode(F.sequence(F.lit(1), F.col("_n")))
                .alias("copy_idx"))
    )

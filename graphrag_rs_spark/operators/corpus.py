"""Per-source corpus profiling and filtering (C4 / RefinedWeb-style).

Web-scale curation drops whole sources (domains, crawls, feeds), not just
documents: a spammy domain is cheaper to kill once than to score doc by
doc.  These operators profile every source and gate documents on their
source's aggregate signals:

  source_stats   — per-source doc/char/token counts, mean quality,
                   exact-duplicate fraction
  filter_sources — keep documents whose source passes the thresholds
                   and is not blocklisted; dropped sources are counted
                   (never silent), matching the curation contract

Scale shape: quality/token signals ride the chained scan-side projection
(textstats keep= pass-through, no self-join of the corpus); the dup
fraction reuses exact_duplicates' single text_hash shuffle; the profile
itself is one groupBy(source) agg to ≤ #sources rows.  filter_sources
joins that small verdict table back on source — broadcast-sized for any
real domain list (≤ tens of millions of rows vs the corpus's billions).

Reference parity note: graphrag-rs is single-corpus and has no source
subsystem; this is a training-pipeline extension mandated by the task
brief alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.operators.dedup import exact_duplicates
from graphrag_rs_spark.operators.textstats import (quality_scores,
                                                   token_stats)


def source_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 source_col: str = "source") -> DataFrame:
    """→ (source, n_docs, total_chars, total_word_tokens, mean_quality,
    dup_frac), one row per source, fractions/means rounded to 6 dp.

    dup_frac is the fraction of the source's docs that lose exact dedup
    (non-canonical members of a content-hash group) — the "this domain
    is mirrors all the way down" signal.
    """
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"),
                       F.col(source_col).alias("source"))
    scored = token_stats(quality_scores(base, keep=("text", "source")),
                         keep=("quality", "source"))
    dup = exact_duplicates(base).select("doc_id", "is_canonical")
    return (scored.join(dup, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("n_word_tokens").alias("total_word_tokens"),
                 F.round(F.avg("quality"), 6).alias("mean_quality"),
                 F.round(F.avg((~F.col("is_canonical")).cast("double")), 6)
                 .alias("dup_frac")))


def length_quantiles(docs: DataFrame, text_col: str = "text",
                     source_col: str = "source",
                     probs: tuple[float, ...] = (0.5, 0.9, 0.99)
                     ) -> DataFrame:
    """Per-source token-length distribution → (source, n_docs,
    mean_tokens, p50, p90, p99 …), quantiles/means rounded to 6 dp.

    The length profile is THE first curation dial (truncation budgets,
    packing bin sizes, "this domain is all stubs / all dumps" cuts).
    Exact linear-interpolation percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`, value-identical) — exact holds the per-GROUP
    value list in the agg buffer, fine while sources stay ≤ ~10⁸ docs
    each; past that swap `percentile` → `approx_percentile` per group
    (same plan shape, engine-private estimate, documented tradeoff).
    """
    from graphrag_rs_spark.functions.hashing import tokens

    base = docs.select(F.col(source_col).alias("source"),
                       F.size(tokens(F.col(text_col))).alias("n_tokens"))
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tokens"), 6).alias("mean_tokens")]
    for p in probs:
        aggs.append(
            F.round(F.percentile("n_tokens", F.lit(float(p))), 6)
            .alias(f"p{int(round(p * 100))}"))
    return base.groupBy("source").agg(*aggs)


def skew_stats(df: DataFrame, key_col: str, top_k: int = 50) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle key →
    (key, cnt, share, cum_share, rank), top_k keys by count.

    This is the pre-flight skew diagnostic: before keying a join or agg
    on `key_col` at scale, read off how much of the table the hottest
    keys own (share / cumulative share) and decide salting.  Plan: one
    map-side-combinable count agg, then a distributed top-k
    (TakeOrdered — no global sort); ranking/cumulation run on the ≤
    top_k survivors only, so nothing single-partition ever sees more
    than top_k rows.  Ties break by key ascending — deterministic.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("_tot"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()) \
        .limit(int(top_k))
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "key", "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("share"),
            F.round(F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("_tot"), 6).alias("cum_share"),
            F.row_number().over(w).alias("rank"),
        )
    )


def filter_sources(docs: DataFrame,
                   min_mean_quality: float = 0.0,
                   max_dup_frac: float = 1.0,
                   blocklist: tuple[str, ...] = (),
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   source_col: str = "source") -> tuple[DataFrame, dict]:
    """→ (surviving docs — original columns, counts dict).

    counts: input_docs, sources_total, sources_dropped, docs_dropped,
    survivors — every drop counted, never silent.
    """
    stats = source_stats(docs, id_col, text_col, source_col)
    verdict = stats.select(
        "source",
        ((F.col("mean_quality") >= min_mean_quality)
         & (F.col("dup_frac") <= max_dup_frac)
         & (~F.col("source").isin(*blocklist) if blocklist else F.lit(True))
         ).alias("_keep")).persist()
    n_sources = verdict.count()
    n_dropped_sources = verdict.where(~F.col("_keep")).count()
    # The verdict's key is aliased before the renamed-column join so the
    # drop below can never swallow an unrelated caller column that
    # happens to be named "source" (the docstring promises original
    # columns back).
    _v = verdict.withColumnRenamed("source", "_verdict_source")
    kept = (docs.join(F.broadcast(_v),
                      docs[source_col] == _v["_verdict_source"], "left")
            .where(F.col("_keep")).drop("_keep", "_verdict_source")
            if source_col != "source" else
            docs.join(F.broadcast(verdict), "source")
            .where(F.col("_keep")).drop("_keep"))
    kept = kept.localCheckpoint(eager=True)
    n_kept = kept.count()
    n_input = docs.count()
    verdict.unpersist()
    return kept, {
        "input_docs": int(n_input),
        "sources_total": int(n_sources),
        "sources_dropped": int(n_dropped_sources),
        "docs_dropped": int(n_input - n_kept),
        "survivors": int(n_kept),
    }

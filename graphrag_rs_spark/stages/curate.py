"""Corpus curation pipeline: the training-data path, end to end.

Chains the curation operators into the standard pre-training sequence —

  1. scrub    — PII redaction (URL/email/IPv4/phone sentinels)
  2. score    — token stats + quality + language id + repetition filters
  3. dedup    — exact content-hash groups; one survivor per group
  4. filter   — drop non-survivors and below-threshold docs (counted)
  5. split    — key-stable train/val/test assignment

— over any (doc_id, text) table, writing one curated parquet plus a
counts dict. Every step is the already-verified operator (see
COVERAGE.md "training-data pipeline family"); this stage only sequences
them, so its correctness surface is the operators' own contract queries.

Scale shape: scrub, token/quality scoring, and the split are scan-side
projections chained on one scan (no joins); language-id and repetition
aggregate (explode + agg, doc_id-keyed shuffles) and join back on
doc_id, so every exchange but one shares the doc_id key — AQE coalesces
and reuses that partitioning; dedup adds the single foreign-key shuffle
(content hash). Nothing collects to the driver except the final counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.operators.dedup import exact_duplicates
from graphrag_rs_spark.operators.sampling import hash_split
from graphrag_rs_spark.operators.scrub import scrub_pii
from graphrag_rs_spark.operators.textstats import (language_id,
                                                   quality_scores,
                                                   repetition_stats,
                                                   token_stats)


_OUT_COLS = ("doc_id", "text_clean", "n_url", "n_email", "n_ipv4",
             "n_phone", "n_word_tokens", "quality", "lang",
             "dup_line_frac", "top_bigram_char_frac", "group_size",
             "split")


def _scored(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per input doc with every curation signal attached."""
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    # projection-only signals chain scan-side (keep= pass-through) — one
    # scan, zero joins; only the genuinely aggregating signals join back
    proj = token_stats(quality_scores(base, keep=("text",)),
                       keep=("quality",))
    stats = (proj.select("doc_id", "n_word_tokens", "quality")
             .join(language_id(base).select("doc_id", "lang"), "doc_id")
             .join(repetition_stats(base).select(
                 "doc_id", "dup_line_frac", "top_bigram_char_frac"),
                 "doc_id"))
    dup = exact_duplicates(base).select(
        "doc_id", "group_size", "is_canonical")
    return scrub_pii(base).join(stats, "doc_id").join(dup, "doc_id")


def _kept(joined: DataFrame, min_quality: float,
          max_dup_line_frac: float) -> DataFrame:
    return joined.filter(
        F.col("is_canonical") & (F.col("quality") >= min_quality)
        & (F.col("dup_line_frac") <= max_dup_line_frac))


def curate_frame(docs: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text",
                 min_quality: float = 0.5,
                 max_dup_line_frac: float = 0.5,
                 split_weights: dict[str, float] | None = None,
                 split_seed: str = "split") -> DataFrame:
    """The curated frame as one lazy plan — no actions, no caching.

    Same output as `curate_documents` minus the counts dict; this is the
    contract-query surface (the DuckDB oracle replays the whole chain as
    composed CTEs), and the form to use when embedding curation inside a
    larger plan.
    """
    joined = _scored(docs, id_col, text_col)
    return hash_split(_kept(joined, min_quality, max_dup_line_frac),
                      "doc_id", weights=split_weights,
                      seed=split_seed).select(*_OUT_COLS)


def curate_documents(docs: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     min_quality: float = 0.5,
                     max_dup_line_frac: float = 0.5,
                     split_weights: dict[str, float] | None = None,
                     split_seed: str = "split") -> tuple[DataFrame, dict]:
    """→ (curated DataFrame, counts dict).

    Curated columns: doc_id, text_clean, n_url/n_email/n_ipv4/n_phone,
    n_word_tokens, quality, lang, dup_line_frac, top_bigram_char_frac,
    group_size, split. One row per surviving document.

    counts: input_docs, pii_redactions, dedup_dropped, quality_dropped,
    repetition_dropped, survivors, per-split sizes — the numbers a
    curation run must report (dropped and counted, never silently).
    """
    joined = _scored(docs, id_col, text_col).persist()
    # `joined` has exactly one row per input doc, so the input count
    # rides in the same agg — no separate full scan of the source table.
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("n_url") + F.col("n_email") + F.col("n_ipv4")
              + F.col("n_phone")).alias("pii"),
        F.sum((~F.col("is_canonical")).cast("int")).alias("dup_dropped"),
        F.sum((F.col("is_canonical")
               & (F.col("quality") < min_quality)).cast("int"))
        .alias("q_dropped"),
        F.sum((F.col("is_canonical") & (F.col("quality") >= min_quality)
               & (F.col("dup_line_frac") > max_dup_line_frac)).cast("int"))
        .alias("rep_dropped"),
    ).collect()[0]

    curated = hash_split(_kept(joined, min_quality, max_dup_line_frac),
                         "doc_id", weights=split_weights,
                         seed=split_seed).select(*_OUT_COLS)

    # materialize the returned frame BEFORE unpersisting its input:
    # a lazy tail would silently recompute the whole join chain when the
    # caller writes it (same discipline as pagerank/random_walks)
    curated = curated.localCheckpoint(eager=True)
    split_sizes = {r["split"]: r["n"] for r in
                   curated.groupBy("split").agg(
                       F.count(F.lit(1)).alias("n")).collect()}
    joined.unpersist()
    counts = {
        "input_docs": int(agg["n_input"]),
        "pii_redactions": int(agg["pii"] or 0),
        "dedup_dropped": int(agg["dup_dropped"] or 0),
        "quality_dropped": int(agg["q_dropped"] or 0),
        "repetition_dropped": int(agg["rep_dropped"] or 0),
        "survivors": int(sum(split_sizes.values())),
        "splits": {k: int(v) for k, v in sorted(split_sizes.items())},
    }
    return curated, counts

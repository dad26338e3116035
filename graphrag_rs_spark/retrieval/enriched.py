"""Enriched metadata-aware retrieval (retrieval/enriched.rs) as one
broadcast join + boost expression.

The reference's metadata_search (:64-141) scans every chunk per query
on the driver; here the (small) query frame broadcasts against the
chunk-metadata table and the whole boost formula is one codegen
expression per (query, chunk) pair:

- keyword boost (:91-97): matched-keyword count / max(|query words|,1)
  · keyword_match_weight, gated on min_keyword_matches; chunk keyword
  DUPLICATES count twice, exactly like the reference's filter-count.
- structure boost (:99-105, :340-378): per extracted reference
  ("chapter X" / "section N[.N]" / "part X" regexes, first match each —
  extract_structure_references :311-337; its capitalized-word branch is
  DEAD CODE there, the input is already lowercased, so it is omitted
  here with this note), chapter contains → +0.5, section → +0.3,
  subsection → +0.2, summed then · structure_match_weight.
- summary boost (:107-112, :381-389): ≥ max(|qw|/2, 1) query words
  contained in the summary → + summary_weight.
- completeness bonus (:114-118; core/metadata.rs:166-199): populated
  metadata fields / 9 > 0.7 → +0.05.  Fields not carried by the caller's
  frame simply count as unpopulated.
- emit only when total boost > 0.05; score = min(base + boost, 1.0)
  where base is the chunk's score in `base_results` else 0.5 (:302-309).

Scale note: the reference's semantics are inherently all-chunks-per-
query; callers keep the query frame bounded (it broadcasts) and the
chunk side streams — one narrow pass, no shuffle of the chunk table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STRUCT_PATTERNS = [r"chapter\s+(\d+|[ivxlcdm]+|\w+)",
                   r"section\s+(\d+\.?\d*)",
                   r"part\s+(\d+|[ivxlcdm]+)"]
META_FIELDS = ["chapter", "section", "subsection", "topic",
               "structural_level", "position_in_document"]


def enriched_metadata_search(
    queries: DataFrame,
    chunks: DataFrame,
    base_results: DataFrame | None = None,
    keyword_match_weight: float = 0.3,
    structure_match_weight: float = 0.2,
    summary_weight: float = 0.15,
    min_keyword_matches: int = 1,
) -> DataFrame:
    """→ (query_id, chunk_id, score): metadata-boosted chunks.

    `queries`: (query_id, query); `chunks`: (chunk_id, keywords
    array<string>, summary, [chapter/section/subsection/...]);
    `base_results`: optional (query_id, chunk_id, score)."""
    ql = F.lower(F.col("query"))
    qw = F.array_distinct(F.filter(F.split(ql, " "),
                                   lambda x: F.length(x) > 3))
    refs = F.filter(
        F.array(*[F.regexp_extract(ql, p, 0) for p in STRUCT_PATTERNS]),
        lambda x: x != "")
    qdf = queries.select("query_id", qw.alias("qw"), refs.alias("refs"),
                         F.greatest(F.size(qw), F.lit(1)).alias("qwn"))

    cols = set(chunks.columns)
    meta_present = [c for c in META_FIELDS if c in cols]
    populated = sum(
        [F.when(F.col(c).isNotNull() & (F.col(c) != ""), 1).otherwise(0)
         for c in meta_present]
        + [F.when(F.size("keywords") > 0, 1).otherwise(0),
           F.when(F.col("summary").isNotNull()
                  & (F.col("summary") != ""), 1).otherwise(0)],
        start=F.lit(0))
    completeness = populated / 9.0
    has_meta = F.size("keywords") > 0
    if "n_entities" in cols:
        has_meta = has_meta | (F.col("n_entities") > 0)
    cdf = chunks.filter(has_meta).withColumn("_compl", completeness)

    def _contains(field, r):
        if field not in cols:
            return F.lit(False)
        return F.coalesce(F.lower(F.col(field)).contains(r),
                          F.lit(False))

    # explicit hint: the docstring's scale contract is that the (small)
    # query frame broadcasts — without it a stats-less query lineage can
    # plan a CartesianProduct that reshuffles the chunk table
    pairs = F.broadcast(qdf).crossJoin(cdf)
    kw_matches = F.size(F.filter(
        F.col("keywords"),
        lambda k: F.array_contains(F.col("qw"), F.lower(k))))
    kw_boost = F.when(
        kw_matches >= min_keyword_matches,
        kw_matches / F.col("qwn") * keyword_match_weight).otherwise(0.0)
    struct_sum = F.aggregate(
        F.col("refs"), F.lit(0.0),
        lambda acc, r: acc
        + F.when(_contains("chapter", r), 0.5).otherwise(0.0)
        + F.when(_contains("section", r), 0.3).otherwise(0.0)
        + F.when(_contains("subsection", r), 0.2).otherwise(0.0))
    sm = F.lower(F.coalesce(F.col("summary"), F.lit("")))
    sum_hits = F.size(F.filter(F.col("qw"), lambda w: sm.contains(w)))
    sum_boost = F.when(
        sum_hits >= F.greatest((F.size("qw") / 2).cast("int"), F.lit(1)),
        summary_weight).otherwise(0.0)
    boost = (kw_boost + struct_sum * structure_match_weight + sum_boost
             + F.when(F.col("_compl") > 0.7, 0.05).otherwise(0.0))
    scored = pairs.withColumn("_boost", F.round(boost, 6)) \
        .filter(F.col("_boost") > 0.05)
    if base_results is not None:
        scored = scored.join(
            base_results.select("query_id", "chunk_id",
                                F.col("score").alias("_base")),
            ["query_id", "chunk_id"], "left")
    else:
        scored = scored.withColumn("_base", F.lit(None).cast("double"))
    return scored.select(
        "query_id", "chunk_id",
        F.round(F.least(F.coalesce("_base", F.lit(0.5))
                        + F.col("_boost"), F.lit(1.0)), 6).alias("score"))

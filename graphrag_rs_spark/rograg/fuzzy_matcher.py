"""Q13 — ROGRAG fuzzy matching, distributed (reference rograg/fuzzy_matcher.rs).

The reference loops over every entity/chunk on one core
(fuzzy_matcher.rs:308-470); here the query is a LITERAL pushed into a
single scan over the entities / chunks DataFrame — matching one query
against 10⁹ entities is one codegen-only Spark job (no UDF, no shuffle
until the final top-k).

Transliterated scoring (fuzzy_matcher.rs:540-605, f32 → double):
  text_similarity = 0.4·jaccard + 0.4·containment + 0.2·levenshtein_sim
    jaccard      = |w1 ∩ w2| / |w1 ∪ w2|            (word sets)
    containment  = |w1 ∩ w2| / min(|w1|, |w2|)
    levenshtein_sim = 1 − dist/max(len)              (characters)
  entity rows (rs:379-423):
    exact name match    → 1.0 (boost_exact) / 0.95, type ExactEntity
    partial name match  → 0.9 × text_similarity if ≥ τ, PartialEntity
    type match          → 0.7 × word_overlap(query, {type}), SemanticEntity
  chunk rows (rs:429-470):
    content similarity  → text_similarity if ≥ τ, ChunkContent
    keyword overlap     → word_overlap if ≥ 0.8·τ, ChunkContent
  word_overlap = |w1 ∩ w2| / min(|words1|, |words2|)  (rs:627-640 — the
  min is over the LISTS' lengths, duplicates included; transliterated)

Semantic expansion (rs:474-538) = one `ego_network` hop over the
relationships table — composed in `match_query` below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SIM_THRESHOLD = 0.6     # fuzzy_matcher.rs:102-107 defaults
MAX_MATCHES = 10
# Repo invariant: every float output is rounded BEFORE ranking/limit so
# the top-k boundary is stable across engines (candidates equal at 6dp
# but differing at machine precision must not flip membership).
ROUND_DP = 6


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def _wordset(col: Column) -> Column:
    return F.array_distinct(_words(col))


def text_similarity(a: Column, b: Column) -> Column:
    """fuzzy_matcher.rs:540-551 — weighted jaccard/containment/levenshtein."""
    la, lb = F.lower(a), F.lower(b)
    w1, w2 = _wordset(la), _wordset(lb)
    inter = F.size(F.array_intersect(w1, w2)).cast("double")
    union = F.size(F.array_union(w1, w2)).cast("double")
    jaccard = F.when(union == 0, 0.0).otherwise(inter / union)
    smaller = F.least(F.size(w1), F.size(w2)).cast("double")
    containment = (
        F.when((F.size(w1) == 0) & (F.size(w2) == 0), 1.0)
        .when(smaller == 0, 0.0)
        .otherwise(inter / smaller))
    max_len = F.greatest(F.length(la), F.length(lb)).cast("double")
    lev = F.when(max_len == 0, 1.0).otherwise(
        1.0 - F.levenshtein(la, lb).cast("double") / max_len)
    return jaccard * 0.4 + containment * 0.4 + lev * 0.2


def word_overlap(a: Column, b: Column) -> Column:
    """fuzzy_matcher.rs:627-640 — |set∩| / min(list lengths)."""
    wl1, wl2 = _words(F.lower(a)), _words(F.lower(b))
    inter = F.size(F.array_intersect(F.array_distinct(wl1),
                                     F.array_distinct(wl2))).cast("double")
    min_size = F.least(F.size(wl1), F.size(wl2)).cast("double")
    return F.when(min_size == 0, 0.0).otherwise(inter / min_size)


def match_entities(
    query: str,
    entities: DataFrame,
    threshold: float = SIM_THRESHOLD,
    boost_exact: bool = True,
) -> DataFrame:
    """→ (id, content, similarity, match_type) candidate rows, unranked."""
    q = F.lit(query)
    name_sim = text_similarity(q, F.col("name"))
    # type match is calculate_word_overlap(query_words, &[type]) — the
    # reference passes the WHOLE lowered type string as the single
    # words2 element (fuzzy_matcher.rs:412), so the score is 1.0 iff
    # some query word equals the full type, never a per-word split
    qw = _words(F.lower(q))
    type_sim = F.when(F.size(qw) == 0, 0.0).otherwise(
        F.array_contains(qw, F.lower(F.col("entity_type")))
        .cast("double"))
    content = F.concat("name", F.lit(" ("), "entity_type", F.lit(")"))
    exact = entities.filter(F.lower(F.col("name")) == F.lower(q)).select(
        F.col("entity_id").alias("id"), content.alias("content"),
        F.lit(1.0 if boost_exact else 0.95).alias("similarity"),
        F.lit("ExactEntity").alias("match_type"))
    partial = entities.filter(
        (F.lower(F.col("name")) != F.lower(q))
        & (name_sim >= F.lit(float(threshold)))
    ).select(
        F.col("entity_id").alias("id"), content.alias("content"),
        F.round(name_sim * 0.9, ROUND_DP).alias("similarity"),
        F.lit("PartialEntity").alias("match_type"))
    # exact-matched entities emit ONLY their ExactEntity row — the
    # reference `continue`s past partial and type matching after an
    # exact hit (fuzzy_matcher.rs:394)
    typed = entities.filter(
        (F.lower(F.col("name")) != F.lower(q)) & (type_sim > 0.0)).select(
        F.concat(F.lit("type_"), "entity_id").alias("id"),
        content.alias("content"),
        F.round(type_sim * 0.7, ROUND_DP).alias("similarity"),
        F.lit("SemanticEntity").alias("match_type"))
    return exact.unionByName(partial).unionByName(typed)


def match_chunks(
    query: str,
    chunks: DataFrame,
    threshold: float = SIM_THRESHOLD,
    preview_len: int = 200,
) -> DataFrame:
    """→ chunk-content candidate rows (fuzzy_matcher.rs:429-470).

    Documented divergence: `content` is the chunk's FIRST preview_len
    chars; the reference's create_content_preview (:745) returns the
    200-char window containing the most query words.  Ranking and ids
    are unaffected (similarity never reads the preview) — only the
    human-facing snippet differs for long chunks."""
    q = F.lit(query)
    content_sim = text_similarity(q, F.col("content"))
    overlap = word_overlap(q, F.col("content"))
    preview = F.substring("content", 1, preview_len)
    by_content = chunks.filter(content_sim >= F.lit(float(threshold))).select(
        F.col("chunk_id").alias("id"), preview.alias("content"),
        F.round(content_sim, ROUND_DP).alias("similarity"),
        F.lit("ChunkContent").alias("match_type"))
    by_keywords = chunks.filter(
        overlap >= F.lit(float(threshold) * 0.8)).select(
        F.concat(F.lit("keywords_"), "chunk_id").alias("id"),
        preview.alias("content"),
        F.round(overlap, ROUND_DP).alias("similarity"),
        F.lit("ChunkContent").alias("match_type"))
    return by_content.unionByName(by_keywords)


def match_query(
    query: str,
    entities: DataFrame,
    chunks: DataFrame | None = None,
    threshold: float = SIM_THRESHOLD,
    max_matches: int = MAX_MATCHES,
    boost_exact: bool = True,
) -> DataFrame:
    """Full fuzzy match: entity + chunk candidates, ranked top-k
    (similarity desc, id asc as the deterministic tie-break)."""
    out = match_entities(query, entities, threshold, boost_exact)
    if chunks is not None:
        out = out.unionByName(match_chunks(query, chunks, threshold))
    return (
        out.orderBy(F.col("similarity").desc(), F.col("id").asc())
        .limit(max_matches)
    )

"""Q9 — LightRAG dual-level retrieval.

Reference (lightrag/dual_retrieval.rs:100-300): split the query into
high-level (topic) and low-level (entity) keywords, search a topic index
and an entity/chunk index in parallel, then merge with one of four
strategies — Interleave (default, alternate high/low), HighFirst,
LowFirst, Weighted (score × level weight) — deduplicating by result id,
first placement wins.

Spark mapping: each level is a BM25-scored DataFrame (retrieval/bm25.py)
over its own corpus; the merge is pure column arithmetic — a placement
position per (level, rank), a window dedup on id keeping the earliest
position, order + limit.  Positional interleave (high→1,3,5…,
low→2,4,6…) reproduces the reference's alternation loop exactly: a dup
or an exhausted side consumes its slot without occupying one, which is
what min-position dedup + limit produce.

The keyword splitter is the LLM seam (keyword_extraction.rs:45-168).
`split_keywords` implements the reference's own deterministic no-LLM
fallback (:175-185 — low-level = query terms >3 chars, max 10) extended
with a graph-aware rule: terms that name a known graph entity are
low-level (entity-specific), the rest high-level (thematic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.retrieval.bm25 import bm25_scores

_BIG = 1_000_000


def split_keywords(
    query: str,
    entity_names: set[str] | None = None,
    max_terms: int = 10,
) -> tuple[list[str], list[str]]:
    """→ (high_level, low_level) keyword lists.

    Without a vocabulary this is exactly the reference fallback: all
    long terms go low-level, high-level empty.  With `entity_names`
    (lowercase), entity-matching terms are low-level and the rest
    high-level — a deterministic stand-in for the LLM splitter.
    """
    words = [w.lower() for w in query.split() if len(w) > 3][:max_terms]
    if not entity_names:
        return [], words
    low = [w for w in words if w in entity_names]
    high = [w for w in words if w not in entity_names]
    return high, low


def _ranked(corpus: DataFrame, terms: list[str], level: str,
            id_col: str, text_col: str, top_k: int) -> DataFrame:
    scored = bm25_scores(corpus, terms, id_col, text_col, top_k=top_k)
    # bm25_scores NORMALIZES its id column to 'doc_id' regardless of
    # id_col — selecting F.col(id_col) here failed for any other name
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return scored.select(
        F.col("doc_id").alias("id"), "score",
        F.lit(level).alias("level"),
        F.row_number().over(w).alias("lvl_rank"))


def dual_retrieve(
    high_corpus: DataFrame,
    low_corpus: DataFrame,
    high_terms: list[str],
    low_terms: list[str],
    top_k: int = 10,
    strategy: str = "interleave",
    high_weight: float = 0.6,
    low_weight: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, level, score, rank): merged dual-level top-k.

    `level` records which index produced the surviving placement of each
    id.  Each side retrieves its own top_k before the merge, mirroring
    the reference (both stores searched with the full budget).  Empty
    keyword lists skip that side (dual_retrieval.rs:151-155).
    """
    sides = []
    if high_terms:
        sides.append(_ranked(high_corpus, high_terms, "high",
                             id_col, text_col, top_k))
    if low_terms:
        sides.append(_ranked(low_corpus, low_terms, "low",
                             id_col, text_col, top_k))
    if not sides:
        raise ValueError("both keyword lists empty")
    both = sides[0] if len(sides) == 1 else sides[0].union(sides[1])

    is_high = (F.col("level") == "high").cast("int")
    if strategy == "interleave":
        pos = F.col("lvl_rank") * 2 - is_high
    elif strategy == "high_first":
        pos = F.col("lvl_rank") + (1 - is_high) * _BIG
    elif strategy == "low_first":
        pos = F.col("lvl_rank") + is_high * _BIG
    elif strategy == "weighted":
        wscore = F.round(
            F.col("score") * F.when(is_high == 1, F.lit(high_weight))
            .otherwise(F.lit(low_weight)), 6)
        pos = F.row_number().over(Window.orderBy(
            wscore.desc(), F.col("level").asc(), F.col("id").asc()))
    else:
        raise ValueError(f"unknown merge strategy: {strategy}")

    placed = both.withColumn("pos", pos)
    dedup = Window.partitionBy("id").orderBy(F.col("pos").asc())
    uniq = placed.withColumn("dd", F.row_number().over(dedup)) \
        .filter(F.col("dd") == 1)
    final = Window.orderBy(F.col("pos").asc())
    return (
        uniq.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= top_k)
        .select("id", "level", "score", "rank")
    )

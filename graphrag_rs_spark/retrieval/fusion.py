"""Result fusion + concept co-occurrence (reference Q5/Q10/Q12).

  rrf_fuse            — Reciprocal Rank Fusion over N scored lists
                        (reranking/cross_encoder.rs, HOW_IT_WORKS.md:870)
  weighted_fuse       — adaptive-weighted union (retrieval/mod.rs:687-749
                        semantics: per-source weight × score, dedup by id,
                        keep best fused score)
  concept_cooccurrence— shared-chunk pair counting ≥ threshold
                        (lightrag/concept_graph.rs:313-445): the generic
                        "items co-occurring in the same container" graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(results: list[DataFrame], k: int = 60,
             id_col: str = "doc_id", score_col: str = "score",
             top_k: int | None = None) -> DataFrame:
    """RRF: fused(d) = Σ_lists 1/(k + rank_list(d)); ranks from score
    desc with id asc tie-break (deterministic)."""
    ranked = []
    for i, df in enumerate(results):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        ranked.append(
            df.select(F.col(id_col).alias("id"),
                      (1.0 / (k + F.row_number().over(w))).alias("rrf")))
    unioned = ranked[0]
    for r in ranked[1:]:
        unioned = unioned.unionByName(r)
    fused = unioned.groupBy("id").agg(
        F.round(F.sum("rrf"), 8).alias("rrf_score"))
    out = fused.orderBy(F.col("rrf_score").desc(), F.col("id").asc())
    return out.limit(top_k) if top_k else out


def weighted_fuse(sources: dict[str, DataFrame], weights: dict[str, float],
                  id_col: str = "doc_id", score_col: str = "score",
                  top_k: int = 10) -> DataFrame:
    """Weighted union + per-id max (retrieval/mod.rs fusion + dedup)."""
    parts = []
    for name, df in sources.items():
        parts.append(df.select(
            F.col(id_col).alias("id"),
            (F.col(score_col) * F.lit(float(weights.get(name, 1.0))))
            .alias("ws"),
            F.lit(name).alias("source")))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy("id").agg(
        F.round(F.max("ws"), 8).alias("fused_score"),
        F.sort_array(F.collect_set("source")).alias("sources"))
    return fused.orderBy(F.col("fused_score").desc(), F.col("id").asc()) \
        .limit(top_k)


def concept_cooccurrence(
    item_container: DataFrame,
    item_col: str = "item",
    container_col: str = "container",
    min_count: int = 2,
) -> DataFrame:
    """→ (item_a, item_b, n_shared) for pairs sharing ≥ min_count
    containers; item_a < item_b.  Same machinery as triple co-occurrence
    (R1) — the mentions/chunk self-join pattern, skew-bounded because
    container fan-out is capped by container size."""
    ic = item_container.select(
        F.col(item_col).alias("item"),
        F.col(container_col).alias("container")).distinct()
    if min_count > 1:
        # a pair sharing ≥ k containers needs both items in ≥ k
        # containers — prune the Zipf tail before the quadratic join
        # (AQE broadcasts the surviving item dim when it is small)
        frequent = (ic.groupBy("item")
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .filter(F.col("_n") >= min_count).select("item"))
        ic = ic.join(frequent, "item")
    a, b = ic.alias("a"), ic.alias("b")
    return (
        a.join(b, (F.col("a.container") == F.col("b.container"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"),
                 F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_count)
    )

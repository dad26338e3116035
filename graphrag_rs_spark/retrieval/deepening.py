"""LightRAG iterative-deepening retrieval (lightrag/iterative_deepening.rs
+ the concept-graph expansion of lightrag/concept_graph.rs and the
connectivity scoring shared with query_refinement.rs:249-283) as a
bounded batch loop.

Algorithmic structure preserved from the reference:
- per depth: the frontier concepts' chunks join in (visited dedup —
  equivalent to the reference's all-current-concepts scan because older
  concepts' chunks are already visited), then the stop checks in
  reference order (iterative_deepening.rs:175-190): max_chunks first,
  then the adaptive quality check (chunks/concepts ≥ threshold, only
  past depth 0 and min_chunks), then no-more-concepts after expansion.
- expansion (:250-310): each current concept contributes its top
  `concepts_per_depth` neighbors by relation confidence
  (get_related_concepts, concept_graph.rs:492-514), candidates not
  already current are scored (ln(freq)+1)·(1+0.5·connections) summed
  once per contributing concept, and the global top
  `concepts_per_depth` join the next frontier.

DETERMINISTIC FORM (documented divergences — the reference's loop is
built on HashMap iteration and is not run-to-run stable):
- relations are undirected (the reference's edge direction is the
  nondeterministic HashMap pair order; neighbors both ways is the only
  stable reading);
- all ties break on concept/chunk ascending after 6-dp rounding;
- scores are micro-int BIGINTs: score_u = round(score·1e6) per
  candidate, total = score_u × n_contributors (the reference adds the
  same float repeatedly — here an exact integer multiply);
- the cap-interleaved `current_concepts.len() < max_total_concepts`
  check (query_refinement.rs:173) is dropped; depth bounds the loop;
- the reference's adaptive-quality check reads
  results.total_chunks/total_concepts_explored BEFORE they are
  populated (iterative_deepening.rs:183-189 + :208-210 — always 0/0,
  the stop can never fire there); here the check evaluates the live
  chunk/concept counts, i.e. the evident intent.

Scale: state is (query_id, concept) and (query_id, chunk) frames — one
shuffle per depth keyed by query_id, frontier joins against the
broadcastable concept tables; millions of queries deepen in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def build_concept_graph(cc: DataFrame, min_cooccurrence: int = 1,
                        ) -> tuple[DataFrame, DataFrame]:
    """From (chunk_id, concept) pairs → (concepts, relations):
    concepts = (concept, freq=#chunks); relations = one row per
    unordered pair (a < b) with shared ≥ min_cooccurrence and
    confidence = 6-dp Jaccard of chunk sets (concept_graph.rs:416-476).
    """
    cc = cc.select("chunk_id", "concept").distinct()
    concepts = cc.groupBy("concept").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"))
    # a pair with shared ≥ k requires BOTH concepts to appear in ≥ k
    # chunks, so the Zipf tail (freq < k — most of the vocabulary) can
    # be pruned BEFORE the quadratic per-chunk self-join, not after
    pairable = cc
    if min_cooccurrence > 1:
        # no broadcast hint: the surviving vocabulary is usually tiny
        # (AQE broadcasts it), but at corpus scale it can be millions of
        # rows and a forced broadcast would OOM the driver
        frequent = concepts.filter(F.col("freq") >= min_cooccurrence) \
            .select("concept")
        pairable = cc.join(frequent, "concept")
    a = pairable.select(F.col("concept").alias("a"), "chunk_id")
    b = pairable.select(F.col("concept").alias("b"), "chunk_id")
    shared = (a.join(b, "chunk_id").filter(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("shared"))
              .filter(F.col("shared") >= min_cooccurrence))
    fa = concepts.select(F.col("concept").alias("a"),
                         F.col("freq").alias("fa"))
    fb = concepts.select(F.col("concept").alias("b"),
                         F.col("freq").alias("fb"))
    relations = (shared.join(fa, "a").join(fb, "b")
                 .select("a", "b", "shared",
                         F.round(F.col("shared")
                                 / (F.col("fa") + F.col("fb")
                                    - F.col("shared")), 6)
                         .alias("confidence")))
    return concepts, relations


def iterative_deepening(
    seeds: DataFrame,
    cc: DataFrame,
    concepts: DataFrame,
    relations: DataFrame,
    max_depth: int = 3,
    concepts_per_depth: int = 2,
    max_chunks: int = 450,
    min_chunks: int = 10,
    quality_threshold: float = 220.0,
) -> DataFrame:
    """→ (query_id, chunk_id, depth_found, depth_reached, stop_reason,
    total_chunks, total_concepts).

    `seeds`: (query_id, concept) initial concepts per query."""
    und = relations.select(F.col("a").alias("src"), F.col("b").alias("nb"),
                           "confidence").union(
        relations.select(F.col("b").alias("src"), F.col("a").alias("nb"),
                         "confidence")).persist()
    score_u = F.round((F.log(F.col("freq").cast("double")) + 1.0)
                      * (1.0 + F.col("connections") * 0.5) * 1e6) \
        .cast("bigint")

    cur = seeds.select("query_id", "concept").distinct() \
        .withColumn("added_depth", F.lit(0)).localCheckpoint(eager=True)
    # visited is a UNION of per-depth checkpointed parts, rebuilt lazily
    # each depth: re-checkpointing the growing union would re-serialize
    # every earlier depth's rows at every depth (O(depth²) write
    # amplification — the betweenness-loop lesson); the parts are each
    # eagerly checkpointed, so unioning them is metadata-only
    visited_parts: list[DataFrame] = []
    visited = None          # (query_id, chunk_id, depth_found)
    stopped = None          # (query_id, stop_reason, depth_reached)
    spark = seeds.sparkSession
    empty_stop = spark.createDataFrame(
        [], "query_id long, stop_reason string, depth_reached int")

    def not_stopped(df):
        return df.join(stopped.select("query_id"), "query_id",
                       "left_anti") if stopped is not None else df

    for d in range(max_depth):
        frontier = not_stopped(cur.filter(F.col("added_depth") == d))
        new_chunks = (frontier.join(cc, frontier["concept"]
                                    == cc["concept"])
                      .select("query_id", "chunk_id").distinct()
                      .withColumn("depth_found", F.lit(d)))
        if visited is not None:
            new_chunks = new_chunks.join(
                visited.select("query_id", "chunk_id"),
                ["query_id", "chunk_id"], "left_anti")
        # queries stopped earlier keep their visited set frozen
        new_chunks = not_stopped(new_chunks).localCheckpoint(eager=True)
        visited_parts.append(new_chunks)
        visited = visited_parts[0]
        for part in visited_parts[1:]:
            visited = visited.union(part)

        stats = (not_stopped(visited.groupBy("query_id")
                             .agg(F.count(F.lit(1)).alias("tc")))
                 .join(cur.groupBy("query_id")
                       .agg(F.count(F.lit(1)).alias("tk")), "query_id"))
        quality = F.round(F.col("tc") / F.col("tk"), 6)
        new_stops = stats.select(
            "query_id",
            F.when(F.col("tc") >= max_chunks, "max_chunks")
            .when((F.lit(d) >= 1) & (F.col("tc") >= min_chunks)
                  & (quality >= quality_threshold), "quality")
            .otherwise(F.lit(None)).alias("stop_reason"),
            F.lit(d).alias("depth_reached")) \
            .filter(F.col("stop_reason").isNotNull())
        stopped = new_stops if stopped is None else \
            stopped.union(new_stops)
        stopped = stopped.localCheckpoint(eager=True)

        # expansion runs on EVERY iteration including the last (the
        # reference expands before discovering the loop is over, and
        # total_concepts_explored counts that final expansion)
        # expansion: per current concept, top-k neighbors by
        # (confidence desc, name asc) — get_related_concepts — then
        # global per-query scoring of fresh candidates
        cur_active = not_stopped(cur)
        wrel = Window.partitionBy("query_id", "concept").orderBy(
            F.col("confidence").desc(), F.col("nb").asc())
        related = (cur_active.join(und, cur_active["concept"]
                                   == und["src"])
                   .withColumn("_rk", F.row_number().over(wrel))
                   .filter(F.col("_rk") <= concepts_per_depth)
                   .select("query_id", F.col("nb").alias("cand")))
        fresh = (related.groupBy("query_id", "cand")
                 .agg(F.count(F.lit(1)).alias("n_contrib"))
                 .join(cur_active.select(
                     "query_id", F.col("concept").alias("cand")),
                     ["query_id", "cand"], "left_anti"))
        # connections: current concepts with ANY edge to the candidate
        conn = (cur_active.join(und.select(F.col("src").alias("concept"),
                                           F.col("nb").alias("cand")),
                                "concept")
                .groupBy("query_id", "cand")
                .agg(F.count(F.lit(1)).alias("connections")))
        scored = (fresh
                  .join(conn, ["query_id", "cand"], "left")
                  .join(concepts.select(F.col("concept").alias("cand"),
                                        "freq"), "cand", "left")
                  .withColumn("connections",
                              F.coalesce("connections", F.lit(0)))
                  .filter(F.col("freq").isNotNull())
                  .withColumn("total_u", score_u * F.col("n_contrib"))
                  .filter(F.col("total_u") > 0))
        wq = Window.partitionBy("query_id").orderBy(
            F.col("total_u").desc(), F.col("cand").asc())
        picked = (scored.withColumn("_rk", F.row_number().over(wq))
                  .filter(F.col("_rk") <= concepts_per_depth)
                  .select("query_id", F.col("cand").alias("concept"))
                  .withColumn("added_depth", F.lit(d + 1))
                  .localCheckpoint(eager=True))
        starved = (cur_active.select("query_id").distinct()
                   .join(picked.select("query_id").distinct(),
                         "query_id", "left_anti")
                   .select("query_id",
                           F.lit("no_more_concepts").alias("stop_reason"),
                           F.lit(d).cast("int").alias("depth_reached")))
        stopped = stopped.union(starved).localCheckpoint(eager=True)
        cur = cur.union(picked).localCheckpoint(eager=True)

    und.unpersist()
    if stopped is None:
        stopped = empty_stop
    summary = (visited.groupBy("query_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("total_chunks"))
               .join(cur.groupBy("query_id")
                     .agg(F.count(F.lit(1)).cast("bigint")
                          .alias("total_concepts")), "query_id")
               .join(stopped, "query_id", "left")
               .select("query_id",
                       F.coalesce("stop_reason",
                                  F.lit("max_depth")).alias("stop_reason"),
                       F.coalesce("depth_reached",
                                  F.lit(max_depth)).cast("int")
                       .alias("depth_reached"),
                       "total_chunks", "total_concepts"))
    return (visited.join(summary, "query_id")
            .select("query_id", "chunk_id",
                    F.col("depth_found").cast("int").alias("depth_found"),
                    "depth_reached", "stop_reason", "total_chunks",
                    "total_concepts"))

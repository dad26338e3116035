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

    # cur and visited are UNIONs of per-depth checkpointed parts,
    # rebuilt lazily each depth: re-checkpointing a growing union would
    # re-serialize every earlier depth's rows at every depth (O(depth²)
    # write amplification — the betweenness-loop lesson); the parts are
    # each eagerly checkpointed, so unioning them is metadata-only.
    # cur_parts[i] is exactly the concepts added at depth i, so the
    # depth-d frontier is cur_parts[d] directly — no union scan.
    cur_parts: list[DataFrame] = [
        seeds.select("query_id", "concept").distinct()
        .withColumn("added_depth", F.lit(0)).localCheckpoint(eager=True)]
    visited_parts: list[DataFrame] = []
    visited = None          # (query_id, chunk_id, depth_found)
    stopped = None          # (query_id, stop_reason, depth_reached)
    spark = seeds.sparkSession
    empty_stop = spark.createDataFrame(
        [], "query_id long, stop_reason string, depth_reached int")

    def not_stopped(df):
        return df.join(stopped.select("query_id"), "query_id",
                       "left_anti") if stopped is not None else df

    def union_all(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    for d in range(max_depth):
        cur = union_all(cur_parts)
        # co-locate each query's frontier concepts in ONE task before
        # the posting-list join: query_id partitioning satisfies the
        # (query_id, chunk_id) distinct's clustering requirement, so the
        # 88M-row join output is deduplicated WITHOUT its own exchange
        # and cross-concept duplicate pairs collapse in-task — measured
        # 43 s → 4 s on the sf0.1 depth-0 frontier.  The partition count
        # MUST be explicit: the frontier is tiny at shuffle time and
        # AQE would coalesce an unnumbered repartition to ~1 partition,
        # single-threading the 8800×-fan-out join that follows.
        conf_val = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            n_part = int(conf_val)
        except ValueError:  # e.g. "auto" on AQE-managed platforms
            n_part = spark.sparkContext.defaultParallelism
        frontier = not_stopped(cur_parts[d]).repartition(n_part,
                                                         "query_id")
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
        visited = union_all(visited_parts)

        # stop bookkeeping stays LAZY within the depth — new_stops and
        # starved derive from checkpointed parts via cheap keyed joins,
        # and the single end-of-depth checkpoint materializes the whole
        # stopped union in one job (was: two eager barriers per depth)
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

        # expansion runs on EVERY iteration including the last (the
        # reference expands before discovering the loop is over, and
        # total_concepts_explored counts that final expansion).
        # get_related_concepts top-k AND the connections count both
        # consume the SAME cur_active ⋈ und join, so rank once and fold
        # both into ONE (query, cand) aggregation: n_contrib = current
        # concepts ranking cand inside their top-k, connections = ALL
        # edge rows from current concepts to cand.
        cur_active = not_stopped(cur)
        wrel = Window.partitionBy("query_id", "concept").orderBy(
            F.col("confidence").desc(), F.col("nb").asc())
        ranked = (cur_active.join(und, cur_active["concept"]
                                  == und["src"])
                  .withColumn("_rk", F.row_number().over(wrel)))
        cand_agg = (ranked.groupBy("query_id",
                                   F.col("nb").alias("cand"))
                    .agg(F.sum(F.when(F.col("_rk") <= concepts_per_depth,
                                      1).otherwise(0)).alias("n_contrib"),
                         F.count(F.lit(1)).alias("connections")))
        fresh = (cand_agg.filter(F.col("n_contrib") > 0)
                 .join(cur_active.select(
                     "query_id", F.col("concept").alias("cand")),
                     ["query_id", "cand"], "left_anti"))
        scored = (fresh
                  .join(concepts.select(F.col("concept").alias("cand"),
                                        "freq"), "cand", "left")
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
        cur_parts.append(picked)

    und.unpersist()
    # total_concepts counts the final expansion too (reference quirk)
    cur = union_all(cur_parts)
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
    # summary is one row per query (bounded by the query count, not the
    # corpus) — broadcast it so the corpus-sized visited table never
    # shuffles for the final annotate
    return (visited.join(F.broadcast(summary), "query_id")
            .select("query_id", "chunk_id",
                    F.col("depth_found").cast("int").alias("depth_found"),
                    "depth_reached", "stop_reason", "total_chunks",
                    "total_concepts"))

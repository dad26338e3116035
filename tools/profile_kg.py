"""Per-stage latency profile of the kg pipeline at bench size.

    python tools/profile_kg.py [n_convs] [cpus]

Each stage is forced with the noop sink so timings are attributable,
at the cost of some recompute (persisted inputs amortize it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from graphrag_rs_spark.session import get_spark
    from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
    from graphrag_rs_spark.datagen import ensure_transcripts
    from graphrag_rs_spark.stages import (chunking, extraction, canonicalize,
                                          materialize)
    from graphrag_rs_spark.stages import triples as triples_mod
    from graphrag_rs_spark.algos.cc import connected_components

    spark = get_spark("profile", master=f"local[{cpus}]",
                      cfg=PipelineConfig(shuffle_partitions=cpus))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DEFAULT_CONFIG

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t_all = time.time()
    path = ensure_transcripts(n_convs, max_turns=120, seed=42)
    transcripts = spark.read.parquet(path).repartition(cpus).cache()
    n = transcripts.count()
    print(f"input: {n} turns ({n_convs} convs), local[{cpus}]", flush=True)

    times = {}

    def stage(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 2)
        print(f"{name:28s} {times[name]:8.2f}s", flush=True)
        return out

    t0 = time.time()
    documents = chunking.assemble_documents(transcripts)
    chunks = chunking.chunk_documents(documents, cfg, num_partitions=cpus)
    chunks = chunks.persist()
    stage("chunks (assemble+chunk)", lambda: noop(chunks))

    bundles = extraction.extract_chunk_bundles(
        chunks, cfg, num_partitions=cpus,
        extra=triples_mod.context_flag_columns()).persist()
    stage("extract (bundles)", lambda: noop(bundles))
    chunk_entities = extraction.chunk_entities_from_bundles(bundles)

    entities = extraction.entities_table(chunk_entities).persist()
    stage("entities_table", lambda: noop(entities))
    mentions = extraction.mentions_table(chunk_entities)
    stage("mentions_table", lambda: noop(mentions))

    flat = triples_mod.emit_triple_mentions_from_bundles(bundles, cfg)
    stage("triple_mentions", lambda: noop(flat))

    pairs = canonicalize.candidate_pairs(entities).persist()
    stage("canon: candidate_pairs", lambda: noop(pairs))
    scored = canonicalize.score_pairs(pairs, cfg)
    from pyspark.sql import functions as F
    edges = scored.filter(
        F.col("sim") >= F.lit(float(cfg.link_min_similarity))
    ).select(F.col("id1").alias("src"), F.col("id2").alias("dst")).persist()
    stage("canon: score+filter", lambda: noop(edges))

    comps = stage("canon: CC", lambda: connected_components(
        edges, nodes=entities.select(F.col("entity_id").alias("node")),
        max_iterations=cfg.cc_max_iterations).persist())
    stage("canon: CC materialize", lambda: noop(comps))

    canon = canonicalize.canonical_map(entities, cfg).persist()
    stage("canon: full canonical_map", lambda: noop(canon))

    t0 = time.time()
    canon_raw = canonicalize.rewrite_triple_mentions(flat, canon, cfg,
                                                     dedup=False)
    canon_triples = triples_mod.triples_with_context(canon_raw, cfg) \
        .localCheckpoint(eager=True)
    times["rewrite+fold+checkpoint"] = round(time.time() - t0, 2)
    print(f"{'rewrite+fold+checkpoint':28s} "
          f"{times['rewrite+fold+checkpoint']:8.2f}s", flush=True)

    canon_entities = materialize.canonical_entities(entities, canon)
    stage("canonical_entities", lambda: noop(canon_entities))

    comms = materialize.communities(canon_entities, canon_triples,
                                    max_iterations=cfg.cc_max_iterations)
    stage("communities", lambda: noop(comms))

    print(f"{'TOTAL (incl. recompute)':28s} {time.time() - t_all:8.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()

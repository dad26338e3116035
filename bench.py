"""Benchmark harness: headline operators at $SPARK_GRAFT_SF_DIR.

    python bench.py                  # one JSON line (driver contract)
    python bench.py --scaling        # same job at N and 4N cores
                                     # (default local[4] vs local[16];
                                     # override SPARK_GRAFT_SCALE_LO/HI)
                                     # → throughput + scaling efficiency

Robustness: the measurement itself runs in a CHILD process (one retry on
failure) so a JVM death — OOM-killed under concurrent memory pressure,
as happened to the round-1 driver run — costs one retry, not the whole
benchmark.  Each --scaling leg is likewise its own process: driver
memory and GC flags are fixed at JVM launch, so legs sharing a JVM would
silently inherit the first leg's sizing.

Design notes:
  - every query materializes via the JVM-side noop sink (full compute,
    no driver collect, no disk)
  - the kg_pipeline entry is the north-rule metric: synthetic seeded
    transcripts (scale via SPARK_GRAFT_KG_CONVS, default 20000) through
    chunk → extract → triples → canonicalize(CC) → communities;
    reported as turns/sec
  - dedup_jaccard is intentionally absent: its all-pairs shingle join is
    the quadratic path minhash_lsh replaces at scale
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

KG_CONVS_DEFAULT = 20000


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_kg(spark, kg_convs: int, parallelism: int,
             suffix: str = "") -> dict[str, float]:
    """North-rule job: seeded transcripts → canonical graph, turns/sec."""
    from graphrag_rs_spark.datagen import ensure_transcripts
    from graphrag_rs_spark.config import DEFAULT_CONFIG
    from graphrag_rs_spark.stages.pipeline import run_pipeline

    path = ensure_transcripts(kg_convs, max_turns=120, seed=42)
    transcripts = spark.read.parquet(path) \
        .repartition(parallelism).cache()
    n_turns = transcripts.count()
    t0 = time.time()
    res = run_pipeline(spark, transcripts, DEFAULT_CONFIG,
                       num_partitions=parallelism)
    # the three output tables are independent DAG leaves reading shared
    # persisted/checkpointed stages — submit their jobs concurrently
    # (standard Spark concurrent-action idiom; the scheduler interleaves
    # tasks, so leaf latencies overlap instead of adding up)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(_noop, [res.canonical_triples, res.communities,
                            res.mentions]))
    dt = round(time.time() - t0, 3)
    transcripts.unpersist()
    return {f"kg_pipeline{suffix}": dt, f"_kg_turns{suffix}": n_turns,
            f"_kg_turns_per_sec{suffix}": round(n_turns / dt, 1)}


def bench_queries(spark, sf_dir: str, kg_convs: int) -> dict[str, float]:
    import __spark_entry__ as entry

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        # drop any cache/plan state a query leaked so the next one is
        # measured in isolation (a few % less cross-query drift)
        spark.catalog.clearCache()
        import gc
        gc.collect()

    # --- north-rule pipeline: transcripts → canonical graph ---
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    timings.update(bench_kg(spark, kg_convs, cpus))
    # one larger point per round: at 20k convs (~87k turns) fixed driver
    # latency (~45s: CC rounds, stage barriers, worker spawn) dominates
    # and under-represents the engine; ~870k turns is past the knee, so
    # round-over-round turns/sec regressions are visible (VERDICT r2 #9)
    kg_big = int(os.environ.get("SPARK_GRAFT_KG_BIG_CONVS", "200000"))
    if kg_big > 0:
        timings.update(bench_kg(spark, kg_big, cpus, suffix="_big"))

    # --- operator suite over the driver-provided sf tables ---
    q = entry.queries()
    for name in ("dedup_exact", "dedup_minhash", "dedup_lsh_pairs",
                 "dedup_clusters", "dedup_segments", "dedup_incremental",
                 "dedup_simhash",
                 "lm_perplexity", "token_stats",
                 "quality_scores",
                 "language_id", "fingerprints", "tfidf_topk", "bm25", "rrf_fusion", "weighted_fusion", "ego_net",
                 "embedding_knn", "ann_ivf", "near_dup_banded",
                 "embedding_centroids",
                 "graph_degree", "clustering_coeff", "community_reports", "graph_stats",
                 "pagerank", "events_hourly", "sessions",
                 "conflict_merge", "sage_embeddings", "rograg_fuzzy",
                 "node2vec", "kg_sql_triples", "bfs_reach",
                 "graph_evolution", "top_growing", "node2vec_walks",
                 "repetition_stats", "contamination", "pack_bins",
                 "scrub_pii", "sample_split", "source_stats",
                 "token_budget", "curate", "ann_lsh_buckets",
                 "dsir_weights", "semdedup", "dedup_substrings",
                 "quality_classifier", "asof_state", "range_band_join",
                 "kmv_distinct", "kcore", "skew_stats",
                 "link_prediction", "cms_heavy_hitters",
                 "bloom_probe", "length_quantiles", "hits",
                 "lpa_communities", "mmr_rerank", "closeness",
                 "betweenness", "intent_classify", "pos_tag",
                 "noun_phrases", "syntax_deps", "detect_language",
                 "md_sections", "logic_form", "html_sections",
                 "iter_deepening", "meta_search", "rograg_validate",
                 "rograg_query_valid", "query_rewrite",
                 "doc_validation", "kg_validation", "tree_query",
                 "cross_rerank", "corpus_entities", "corpus_relations",
                 "qa_eval", "kg_sql_entities", "kg_sql_entities2",
                 "kg_sql_mentions", "kg_sql_triples2",
                 "inferred_relations", "kg_sql_persons", "kg_sql_chunks",
                 "kg_sql_pipeline_entities", "kg_sql_pipeline_triples",
                 "kg_sql_transcript_triples"):
        run(name, lambda name=name: _noop(q[name](spark, sf_dir)))
    return timings


def child_main(sf_dir: str, cpus: int, kg_convs: int) -> None:
    """One full measurement in THIS process; prints the driver JSON line."""
    from graphrag_rs_spark.session import get_spark
    from graphrag_rs_spark.config import PipelineConfig

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("bench", master=f"local[{cpus}]",
                      cfg=PipelineConfig(shuffle_partitions=cpus))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    timings = bench_queries(spark, sf_dir, kg_convs)
    total = round(time.time() - t0, 3)
    queries = {k: v for k, v in timings.items() if not k.startswith("_")}
    payload = {
        "metric": "indexing+operator suite wall time "
                  f"(kg {timings['_kg_turns']} turns @ "
                  f"{timings['_kg_turns_per_sec']} turns/sec)",
        "value": total, "unit": "sec",
        "queries": queries, "sf": float(sf),
        "kg_turns_per_sec": timings["_kg_turns_per_sec"],
    }
    if "_kg_turns_per_sec_big" in timings:
        payload["kg_turns_big"] = timings["_kg_turns_big"]
        payload["kg_turns_per_sec_big"] = timings["_kg_turns_per_sec_big"]
    print(json.dumps(payload), flush=True)
    spark.stop()


def _run_child(argv: list[str], attempts: int = 2) -> str:
    """Run a measurement subprocess, retrying once; return its last line."""
    last_err = ""
    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, *argv], cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        lines = [ln for ln in proc.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            return lines[-1]
        last_err = (proc.stderr or "")[-2000:]
        if attempt < attempts - 1:
            time.sleep(10 * (attempt + 1))   # let transient pressure drain
    raise RuntimeError(f"benchmark child failed twice; last stderr:\n{last_err}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    kg_convs = int(os.environ.get("SPARK_GRAFT_KG_CONVS",
                                  str(KG_CONVS_DEFAULT)))

    if "--child" in sys.argv:
        child_main(sf_dir, cpus, kg_convs)
        return

    if "--scaling" in sys.argv:
        # North-rule scaling probe: same job at N and 4N cores, each leg
        # a fresh process/JVM (see module docstring).  N=4 → 4N=16, NOT
        # 8→32: this sandbox VM only delivers ~2.6× more cycles at
        # 32-way than 8-way load even on embarrassingly parallel pure-CPU
        # work (host throttling above ~16-way), while 4→16 scales at
        # ~1.0 — measured with a multiprocessing spin benchmark,
        # recorded in BENCH.md.  Override via env if needed.
        lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4"))
        hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "16"))
        n_convs = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "500000"))
        sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
        legs = {}
        for par in (lo, hi):
            legs[par] = json.loads(_run_child(
                ["tools/scaling_leg.py", str(par), str(n_convs)]))
        eff = round((legs[hi]["turns_per_sec"] / legs[lo]["turns_per_sec"])
                    / (hi / lo), 3)
        print(json.dumps({
            "metric": f"kg scaling efficiency local[{lo}]→local[{hi}]",
            "value": eff, "unit": "ratio", "sf": sf,
            "turns": legs[lo]["turns"],
            f"turns_per_sec_{lo}": legs[lo]["turns_per_sec"],
            f"turns_per_sec_{hi}": legs[hi]["turns_per_sec"],
            f"kg_sec_{lo}": legs[lo]["wall_sec"],
            f"kg_sec_{hi}": legs[hi]["wall_sec"],
        }))
        return

    print(_run_child([os.path.join(REPO, "bench.py"), "--child"]))


if __name__ == "__main__":
    main()

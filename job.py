"""spark-submit entry point for the full indexing pipeline.

    spark-submit --master local[32] --py-files dist/graphrag_rs_spark.zip \
        job.py --input data/transcripts_small.parquet \
               --workdir /tmp/graphrag_out --run-id run1 [--no-resume]

    # Iceberg / catalog-table input (north-rule deployment; needs the
    # Iceberg runtime jar + catalog confs on the submit line, DEPLOY.md):
    spark-submit ... job.py --table lake.raw.transcripts --workdir ...

    # Live turn-event feed (turns arrive one at a time, conversations
    # span micro-batches): stateful sessionization assembles complete
    # conversations, then the same batch stages index each micro-batch;
    # --stream-once drains what's present and exits (omit for 24/7):
    spark-submit ... job.py --stream-dir /lake/turn_events \
        --workdir /tmp/graphrag_out --stream-gap-minutes 30 --stream-once

    # Training-data curation over a (doc_id, text) documents table:
    # optional whole-source gating (blocklist / mean-quality / dup-frac
    # thresholds), then PII scrub -> quality/language/repetition scoring
    # -> exact dedup -> counted filtering -> key-stable train/val/test
    # split, written to {workdir}/curated with a JSON counts line:
    spark-submit ... job.py --curate-docs /lake/documents.parquet \
        --workdir /tmp/curation_out \
        --source-blocklist spam.example,mirror.example \
        --min-source-quality 0.4 --max-source-dup-frac 0.8

Runs transcripts → chunks → entities → triples → canonicalize →
materialize with per-stage parquet outputs + per-partition lineage in
{workdir}/_checkpoints (see stages/checkpoint.py).  A killed run rerun
with the same workdir resumes from the last committed stage.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path of transcripts")
    src.add_argument("--table", help="catalog table (e.g. Iceberg) "
                                     "of transcripts")
    src.add_argument("--stream-dir", help="directory of turn-event "
                     "parquet files to index as a stateful stream")
    src.add_argument("--curate-docs", help="parquet path of a "
                     "(doc_id, text) documents table to run the "
                     "training-data curation pipeline over")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--run-id", default="run0")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--master", default=None)
    parser.add_argument("--stream-gap-minutes", type=float, default=30.0,
                        help="session gap closing a streamed conversation")
    parser.add_argument("--stream-once", action="store_true",
                        help="drain available files and exit "
                             "(trigger availableNow)")
    parser.add_argument("--source-blocklist", default="",
                        help="comma-separated sources to drop before "
                             "document-level curation (--curate-docs)")
    parser.add_argument("--min-source-quality", type=float, default=None,
                        help="drop whole sources below this mean quality "
                             "before document-level curation")
    parser.add_argument("--max-source-dup-frac", type=float, default=None,
                        help="drop whole sources above this exact-dup "
                             "fraction before document-level curation")
    args = parser.parse_args()

    from graphrag_rs_spark.session import get_spark
    from graphrag_rs_spark.config import DEFAULT_CONFIG
    from graphrag_rs_spark.stages.pipeline import run_pipeline_checkpointed

    spark = get_spark("graphrag_rs_spark.job", master=args.master)

    if args.curate_docs:
        import os
        from graphrag_rs_spark.stages.curate import curate_documents
        t0 = time.time()
        docs = spark.read.parquet(args.curate_docs)
        counts = {}
        blocklist = tuple(s for s in args.source_blocklist.split(",") if s)
        if blocklist or args.min_source_quality is not None \
                or args.max_source_dup_frac is not None:
            from graphrag_rs_spark.operators.corpus import filter_sources
            docs, src_counts = filter_sources(
                docs,
                min_mean_quality=args.min_source_quality or 0.0,
                max_dup_frac=(1.0 if args.max_source_dup_frac is None
                              else args.max_source_dup_frac),
                blocklist=blocklist)
            counts.update({f"source_{k}": v for k, v in src_counts.items()})
        curated, doc_counts = curate_documents(docs)
        counts.update(doc_counts)
        curated.write.mode("overwrite").parquet(
            os.path.join(args.workdir, "curated"))
        print(json.dumps({
            "status": "ok", "mode": "curate",
            "elapsed_sec": round(time.time() - t0, 2), **counts,
        }))
        spark.stop()
        return

    if args.stream_dir:
        import os
        from graphrag_rs_spark.streaming.sessionize import (
            stream_sessionized_index,
        )
        t0 = time.time()
        q = stream_sessionized_index(
            spark, args.stream_dir,
            out_dir=os.path.join(args.workdir, "tables"),
            checkpoint_dir=os.path.join(args.workdir, "_stream_ck"),
            cfg=DEFAULT_CONFIG,
            gap_minutes=args.stream_gap_minutes,
            trigger_once=args.stream_once,
        )
        q.awaitTermination()
        print(json.dumps({
            "status": "ok", "mode": "stream",
            "elapsed_sec": round(time.time() - t0, 2),
            "last_progress": q.lastProgress and {
                k: q.lastProgress.get(k)
                for k in ("batchId", "numInputRows")},
        }))
        spark.stop()
        return
    t0 = time.time()
    transcripts = (spark.read.table(args.table) if args.table
                   else spark.read.parquet(args.input))
    n_turns = transcripts.count()
    res = run_pipeline_checkpointed(
        spark, transcripts,
        workdir=args.workdir, run_id=args.run_id,
        cfg=DEFAULT_CONFIG, resume=not args.no_resume,
    )
    counts = {
        "documents": res.documents.count(),
        "chunks": res.chunks.count(),
        "entities": res.entities.count(),
        "mentions": res.mentions.count(),
        "triples": res.triples.count(),
        "canonical_triples": res.canonical_triples.count(),
        "communities": res.communities.count(),
    }
    elapsed = time.time() - t0
    print(json.dumps({
        "status": "ok",
        "turns": n_turns,
        "elapsed_sec": round(elapsed, 2),
        "turns_per_sec": round(n_turns / elapsed, 1),
        **counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

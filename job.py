"""spark-submit entry point for the full indexing pipeline.

    spark-submit --master local[32] --py-files dist/graphrag_rs_spark.zip \
        job.py --input data/transcripts_small.parquet \
               --workdir /tmp/graphrag_out --run-id run1 [--no-resume]

    # Iceberg / catalog-table input (north-rule deployment; needs the
    # Iceberg runtime jar + catalog confs on the submit line, DEPLOY.md):
    spark-submit ... job.py --table lake.raw.transcripts --workdir ...

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
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--run-id", default="run0")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from graphrag_rs_spark.session import get_spark
    from graphrag_rs_spark.config import DEFAULT_CONFIG
    from graphrag_rs_spark.stages.pipeline import run_pipeline_checkpointed

    spark = get_spark("graphrag_rs_spark.job", master=args.master)
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

"""Host shuffle-scaling ceiling: a pure-Spark shuffle+set-agg job (the
pipeline's fold shape: short strings + longs, collect_set per group) at a
given thread count, fresh JVM per leg.

    python tools/shuffle_calibration.py <cores> [n_rows]

The pipeline's non-extraction stages are shuffle + object-agg bound; this
measures what THE HOST lets that workload scale to in one JVM (shared
shuffle disk, shared heap/GC) — the ceiling against which pipeline stage
scaling is judged, exactly like the pure-CPU spin calibration bounds the
CPU-bound stages.  No graphrag code in the job: scaling losses here are
the host's, not the engine's.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 35_000_000
    from graphrag_rs_spark.session import get_spark
    from graphrag_rs_spark.config import PipelineConfig
    from pyspark.sql import functions as F

    spark = get_spark("shufcal", master=f"local[{cores}]",
                      cfg=PipelineConfig(shuffle_partitions=cores))
    spark.sparkContext.setLogLevel("ERROR")
    # ~the fold's byte mix: two short id strings, a predicate string, a long
    df = (spark.range(n_rows, numPartitions=cores)
          .select(
              F.concat(F.lit("ent_"), (F.col("id") % 200_000).cast("string"))
              .alias("subj"),
              F.concat(F.lit("PRED_"), (F.col("id") % 10).cast("string"))
              .alias("pred"),
              F.concat(F.lit("ent_"), ((F.col("id") * 7919) % 200_000)
                       .cast("string")).alias("obj"),
              F.xxhash64("id").alias("chunk_key")))
    t0 = time.time()
    out = (df.repartition(cores, "subj", "pred", "obj")
           .groupBy("subj", "pred", "obj")
           .agg(F.sort_array(F.collect_set("chunk_key")).alias("ks")))
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(json.dumps({"cores": cores, "rows": n_rows,
                      "wall_sec": round(dt, 2),
                      "rows_per_sec": round(n_rows / dt)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

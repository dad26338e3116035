"""Run ONE leg of the scaling measurement in a fresh process.

    python tools/scaling_leg.py <parallelism> <n_convs>

Prints one JSON line {par, turns, wall_sec, turns_per_sec}.  Kept as a
standalone process so a JVM death in one leg cannot take down the other,
and so each leg starts with a cold, honest JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    par = int(sys.argv[1])
    n_convs = int(sys.argv[2])
    # By default shuffle partitions track core count (how a real cluster
    # is sized).  SPARK_GRAFT_LEG_PARTITIONS fixes them across legs to
    # isolate pure thread scaling from partition-size effects (a
    # 4-partition shuffle at 2M+ turns holds 4x the rows per task).
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_LEG_PARTITIONS", par))

    from graphrag_rs_spark.session import get_spark
    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.datagen import ensure_transcripts
    from graphrag_rs_spark.stages.pipeline import run_pipeline

    path = ensure_transcripts(n_convs, max_turns=120, seed=42)
    cfg = PipelineConfig(shuffle_partitions=shuffle_parts)
    spark = get_spark("scaling-leg", master=f"local[{par}]", cfg=cfg)
    spark.sparkContext.setLogLevel("ERROR")

    transcripts = spark.read.parquet(path).repartition(shuffle_parts).cache()
    n_turns = transcripts.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    res = run_pipeline(spark, transcripts, cfg, num_partitions=shuffle_parts)
    # independent DAG leaves — materialize concurrently (same as bench.py)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(noop, [res.canonical_triples, res.communities,
                           res.mentions]))
    wall = time.time() - t0
    print(json.dumps({
        "par": par, "turns": n_turns, "wall_sec": round(wall, 1),
        "turns_per_sec": round(n_turns / wall, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Structured Streaming incremental indexing == batch build parity."""

import os

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG
from graphrag_rs_spark.datagen import generate_rows
from graphrag_rs_spark.streaming import incremental


@pytest.fixture(scope="module")
def split_input(spark, tmp_path_factory):
    """Two increments of whole conversations, written as separate files."""
    rows = generate_rows(20, seed=42, max_turns=20)
    half = {f"conv_{c:06d}" for c in range(10)}
    d = tmp_path_factory.mktemp("stream_in")
    for name, pred in (("batch1", lambda r: r["conv_id"] in half),
                       ("batch2", lambda r: r["conv_id"] not in half)):
        df = spark.createDataFrame([r for r in rows if pred(r)])
        # write with the input_hint contract type (turn_idx: int32)
        df = df.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        df.coalesce(1).write.mode("overwrite").parquet(str(d / name))
    return rows, d


def test_incremental_equals_batch(spark, split_input, tmp_path):
    rows, d = split_input
    out = str(tmp_path / "out")

    # two micro-batch increments via the shared stage functions
    for sub in ("batch1", "batch2"):
        batch = spark.read.parquet(str(d / sub))
        counts = incremental.process_increment(batch, out, DEFAULT_CONFIG)
        assert counts["chunks"] > 0

    entities, flat = incremental.merge_increment_tables(spark, out)

    # batch oracle over the full input
    from graphrag_rs_spark.stages.pipeline import run_pipeline
    full = run_pipeline(spark, spark.createDataFrame(rows))

    inc_ents = {(r["entity_id"], r["mention_count"])
                for r in entities.collect()}
    bat_ents = {(r["entity_id"], r["mention_count"])
                for r in full.entities.collect()}
    assert inc_ents == bat_ents

    inc_triples = {(r["subj"], r["pred"], r["obj"]) for r in flat.collect()}
    bat_triples = {(r["subj"], r["pred"], r["obj"])
                   for r in full.triple_mentions.collect()}
    assert inc_triples == bat_triples


def test_stream_index_available_now(spark, split_input, tmp_path):
    _, d = split_input
    # stream source dir with both files
    src = str(tmp_path / "src")
    os.makedirs(src)
    for sub in ("batch1", "batch2"):
        for f in os.listdir(str(d / sub)):
            if f.endswith(".parquet"):
                os.link(str(d / sub / f), os.path.join(src, f"{sub}_{f}"))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = incremental.stream_index(spark, src, out, ck, trigger_once=True)
    q.awaitTermination(120)
    ents, flat = incremental.merge_increment_tables(spark, out)
    assert ents.count() > 0
    assert flat.count() > 0

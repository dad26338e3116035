"""Property tests mirroring the reference's own property suite
(/root/reference/tests/property_tests.rs) on this engine's equivalents.

Mapping (reference test → here):
  test_embedder_determinism / dimension_consistency / batch_consistency
    (:146-193)  → hash_embeddings: same text ⇒ same vector, every vector
                  has the requested dim, and a text's vector is
                  independent of what other rows sit in the batch
  test_embedder_empty_text_handling (:195-216)
              → empty/whitespace docs yield a well-formed zero-count
                result (no crash, no ragged vector)
  test_entity_extractor_confidence_threshold / threshold_ordering /
    empty_text (:353-408)
              → extract_from_chunk respects min_confidence, higher
                thresholds yield subsets, empty text yields nothing
  test_vector_store_exact_match / similarity_ordering (:221-316)
              → cosine_topk: a stored vector queried by itself ranks
                first at sim 1.0; ranks are sorted by sim desc
  test_config_save_load_roundtrip (:456-477)
              → PipelineConfig dataclass asdict/replace round-trip
"""

from __future__ import annotations

import dataclasses

import pytest
from hypothesis import given, settings, strategies as st

from graphrag_rs_spark import reference_logic as rl
from graphrag_rs_spark.config import PipelineConfig

TYPES = ("PERSON", "ORGANIZATION", "LOCATION", "CONCEPT")

TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=300)


# ---- extractor properties (pure kernel — no Spark needed) --------------

@settings(max_examples=40, deadline=None)
@given(TEXTS, st.sampled_from([0.5, 0.7, 0.8, 0.9]))
def test_extractor_confidence_threshold(text, thr):
    for e in rl.extract_from_chunk(text, TYPES, thr):
        assert e.confidence >= thr


@settings(max_examples=40, deadline=None)
@given(TEXTS)
def test_extractor_threshold_ordering(text):
    lo = {e.entity_id for e in rl.extract_from_chunk(text, TYPES, 0.5)}
    hi = {e.entity_id for e in rl.extract_from_chunk(text, TYPES, 0.9)}
    assert hi <= lo


@pytest.mark.parametrize("empty", ["", " ", "   ", "\n", "\t"])
def test_extractor_empty_text(empty):
    assert rl.extract_from_chunk(empty, TYPES, 0.5) == []


# ---- embedder + vector-store properties (one Spark session) ------------

def test_embedder_and_search_properties(spark):
    from pyspark.sql import functions as F
    from graphrag_rs_spark.functions.embeddings import (
        hash_embeddings, pack_embeddings)
    from graphrag_rs_spark.operators.similarity import cosine_topk

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"),
         (2, "delta epsilon"), (3, ""), (4, "  \t "),
         (5, "zeta eta theta iota")],
        "doc_id long, text string")
    dim = 16
    packed = pack_embeddings(
        hash_embeddings(docs, dim=dim)).persist()
    rows = {r["id"]: list(r["embedding"]) for r in packed.collect()}

    # dimension consistency: every emitted vector has the requested dim
    assert all(len(v) == dim for v in rows.values())
    # determinism + batch consistency: identical texts embed identically
    # even though they sit beside different rows
    assert rows[0] == rows[1]
    # distinct texts differ (hash-TF on disjoint vocab)
    assert rows[0] != rows[2]
    # empty/whitespace docs: gracefully absent (no ragged vector, no
    # crash) — the tokenizer yields zero words, so no long-form rows
    assert 3 not in rows and 4 not in rows

    # vector-store exact match: querying a stored vector by itself
    # returns that id at rank 1 with sim 1.0
    vectors = packed.select(F.col("id").alias("vec_id"), "embedding")
    queries = vectors.filter(F.col("vec_id") == 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk(vectors, queries, k=3).collect()
    first = [r for r in top if r["rank"] == 1][0]
    assert first["vec_id"] in (5,)
    assert first["sim"] == 1.0
    # similarity ordering: ranks sorted by sim desc
    sims = [r["sim"] for r in sorted(top, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)
    packed.unpersist()


# ---- config round-trip (property_tests.rs:456-477) ---------------------

def test_config_roundtrip():
    cfg = PipelineConfig(chunk_size=512, chunk_overlap=64,
                         min_confidence=0.8)
    d = dataclasses.asdict(cfg)
    back = PipelineConfig(**d)
    assert back == cfg
    assert dataclasses.asdict(back) == d

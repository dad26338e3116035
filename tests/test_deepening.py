"""Golden tests for iterative-deepening retrieval
(lightrag/iterative_deepening.rs) — every expectation hand-traced
through the reference's loop on a 7-chunk concept graph."""

from graphrag_rs_spark.retrieval.deepening import (
    build_concept_graph, iterative_deepening)
from tests.conftest import spark  # noqa: F401

CC = [("c1", "A"), ("c1", "B"), ("c2", "A"), ("c2", "C"),
      ("c3", "B"), ("c3", "C"), ("c4", "C"), ("c4", "D"),
      ("c5", "D"), ("c5", "E"), ("c6", "E"), ("c7", "C"), ("c7", "D")]


def _setup(spark, seeds):
    cc = spark.createDataFrame(CC, "chunk_id string, concept string")
    concepts, relations = build_concept_graph(cc)
    sdf = spark.createDataFrame(seeds, "query_id long, concept string")
    return sdf, cc, concepts, relations


def test_graph_build_jaccard(spark):
    _, _, concepts, relations = _setup(spark, [(0, "A")])
    freq = {r.concept: r.freq for r in concepts.collect()}
    assert freq == {"A": 2, "B": 2, "C": 4, "D": 3, "E": 2}
    conf = {(r.a, r.b): r.confidence for r in relations.collect()}
    assert conf[("A", "B")] == 0.333333
    assert conf[("C", "D")] == 0.4            # 2 shared / (4+3-2)
    assert conf[("A", "C")] == 0.2


def test_topk_before_exclusion_starves_expansion(spark):
    # k=1: A's only top-1 neighbor is B; B's top-1 is A (already
    # current) — C is never reached even though edges exist
    # (get_related_concepts truncates BEFORE the exclusion filter)
    sdf, cc, concepts, relations = _setup(spark, [(0, "A")])
    out = iterative_deepening(sdf, cc, concepts, relations,
                              max_depth=3, concepts_per_depth=1,
                              max_chunks=100, min_chunks=100,
                              quality_threshold=1e9).collect()
    assert {r.chunk_id for r in out} == {"c1", "c2", "c3"}
    assert out[0].stop_reason == "no_more_concepts"
    assert out[0].depth_reached == 1
    assert out[0].total_concepts == 2         # A, B


def test_full_run_expands_on_final_iteration(spark):
    sdf, cc, concepts, relations = _setup(spark, [(0, "A")])
    out = iterative_deepening(sdf, cc, concepts, relations,
                              max_depth=3, concepts_per_depth=2,
                              max_chunks=100, min_chunks=100,
                              quality_threshold=1e9).collect()
    depths = {r.chunk_id: r.depth_found for r in out}
    assert depths == {"c1": 0, "c2": 0, "c3": 1, "c4": 1, "c7": 1,
                      "c5": 2}
    assert out[0].stop_reason == "max_depth"
    assert out[0].depth_reached == 3
    assert out[0].total_chunks == 6
    # E joins in the (reference-faithful) final-iteration expansion
    assert out[0].total_concepts == 5


def test_max_chunks_stop_at_depth_zero(spark):
    sdf, cc, concepts, relations = _setup(spark, [(0, "C")])
    out = iterative_deepening(sdf, cc, concepts, relations,
                              max_depth=3, concepts_per_depth=2,
                              max_chunks=3, min_chunks=100,
                              quality_threshold=1e9).collect()
    assert out[0].stop_reason == "max_chunks"
    assert out[0].depth_reached == 0
    assert out[0].total_chunks == 4           # C's own chunks count


def test_quality_stop_not_at_depth_zero(spark):
    # quality 2/1=2 ≥ 1.5 at depth 0 must NOT stop (reference guard);
    # at depth 1: 3 chunks / 2 concepts = 1.5 → stop
    sdf, cc, concepts, relations = _setup(spark, [(0, "A")])
    out = iterative_deepening(sdf, cc, concepts, relations,
                              max_depth=3, concepts_per_depth=1,
                              max_chunks=100, min_chunks=1,
                              quality_threshold=1.5).collect()
    assert out[0].stop_reason == "quality"
    assert out[0].depth_reached == 1
    assert out[0].total_chunks == 3


def test_independent_queries_stop_independently(spark):
    sdf, cc, concepts, relations = _setup(
        spark, [(0, "C"), (1, "E")])
    out = iterative_deepening(sdf, cc, concepts, relations,
                              max_depth=3, concepts_per_depth=1,
                              max_chunks=3, min_chunks=100,
                              quality_threshold=1e9)
    got = {(r.query_id, r.stop_reason, r.depth_reached)
           for r in out.collect()}
    # C's own 4 chunks trip the cap at depth 0; E(2 chunks) expands to
    # D first and only trips it at depth 1
    assert (0, "max_chunks", 0) in got
    assert (1, "max_chunks", 1) in got

"""G12 graph embeddings (reference graph/embeddings.rs)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.algos.embeddings import (
    random_walks, node2vec_embeddings, sage_mean_embeddings)


@pytest.fixture(scope="module")
def diamond_edges(spark):
    # a↔b, b↔c, c↔d, a→c  (mixed degrees, d is near-sink)
    return spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
         ("c", "d"), ("d", "c"), ("a", "c")],
        "src string, dst string")


def test_walks_deterministic(diamond_edges):
    w1 = sorted(map(str, random_walks(diamond_edges, 3, 6, seed=42).collect()))
    w2 = sorted(map(str, random_walks(diamond_edges, 3, 6, seed=42).collect()))
    assert w1 == w2
    w3 = sorted(map(str, random_walks(diamond_edges, 3, 6, seed=43).collect()))
    assert w1 != w3          # seed actually steers the draws


def test_walks_respect_edges_and_length(diamond_edges):
    edge_set = {(r["src"], r["dst"]) for r in diamond_edges.collect()}
    walks = random_walks(diamond_edges, 2, 5, seed=1).collect()
    assert len(walks) == 4 * 2          # walks_per_node per node
    for r in walks:
        w = r["walk"]
        assert 1 <= len(w) <= 5
        assert w[0] == r["node"]        # starts at its node
        for a, b in zip(w, w[1:]):
            assert (a, b) in edge_set   # every hop is a real edge


def test_walk_stops_at_sink(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    walks = {r["node"]: r["walk"]
             for r in random_walks(edges, 1, 6, seed=5).collect()}
    # b has no out-neighbors: reference breaks (embeddings.rs:203-205)
    assert walks["a"] == ["a", "b"]
    # b never starts: it has no adjacency row (reference walks start from
    # graph.nodes; our starts come from nodes with out-edges)
    assert "b" not in walks


def test_return_param_bias(spark):
    # path graph x–y with an extra y–z; from y, a huge p (return_param)
    # makes returning to the previous node ~impossible, tiny p forces it
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")],
        "src string, dst string")
    always_return = random_walks(edges, 4, 4, p=1e-9, q=1.0, seed=3).collect()
    for r in always_return:
        w = r["walk"]
        for i in range(2, len(w)):
            assert w[i] == w[i - 2]     # every step returns to prev
    never_return = random_walks(edges, 4, 6, p=1e9, q=1.0, seed=3).collect()
    for r in never_return:
        w = r["walk"]
        for i in range(2, len(w)):
            # x and z have only one neighbor (y) — forced return is
            # allowed there; y must always avoid returning
            if w[i - 1] == "y":
                assert w[i] != w[i - 2]


def test_sage_mean_exact(spark, diamond_edges):
    feats = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]),
         ("c", [1.0, 1.0]), ("d", [2.0, 0.0])],
        "node string, features array<double>")
    out = {r["node"]: r["features"]
           for r in sage_mean_embeddings(feats, diamond_edges,
                                         num_layers=2).collect()}
    # hand-computed: layer = (self + mean(neighbors)) / 2, twice
    assert out["a"] == pytest.approx([0.75, 0.625])
    assert out["b"] == pytest.approx([0.6875, 0.6875])
    assert out["c"] == pytest.approx([1.0, 0.6875])
    assert out["d"] == pytest.approx([1.25, 0.625])


def test_sage_isolated_node_halves(spark):
    # no out-neighbors → neighbor aggregate is the zero vector
    # (embeddings.rs:443-445) → (self + 0)/2 per layer
    feats = spark.createDataFrame([("lone", [4.0, 8.0])],
                                  "node string, features array<double>")
    edges = spark.createDataFrame([], "src string, dst string")
    out = sage_mean_embeddings(feats, edges, num_layers=2).collect()
    assert out[0]["features"] == pytest.approx([1.0, 2.0])


def test_node2vec_output_shape(diamond_edges):
    emb = node2vec_embeddings(diamond_edges, dimension=8, walks_per_node=2,
                              walk_length=6, window=3, seed=7)
    rows = emb.collect()
    assert {r["node"] for r in rows} == {"a", "b", "c", "d"}
    assert all(len(r["embedding"]) == 8 for r in rows)
    assert all(isinstance(v, float) for r in rows for v in r["embedding"])


def test_walks_invariant_to_partitioning(spark, diamond_edges):
    """The hash draw depends only on (start, walk_id, step, cur, seed) —
    walks must be identical under any physical partitioning (the property
    that makes the operator safe on a real cluster)."""
    w1 = sorted(map(str, random_walks(
        diamond_edges.repartition(1), 2, 5, seed=9).collect()))
    w2 = sorted(map(str, random_walks(
        diamond_edges.repartition(7, "src"), 2, 5, seed=9).collect()))
    assert w1 == w2


def test_walks_h60_draw_engine_portable(diamond_edges):
    """The h60 draw variant is deterministic and structurally valid —
    the cross-engine value check lives in the node2vec_walks contract
    oracle (__spark_entry__)."""
    edge_set = {(r["src"], r["dst"]) for r in diamond_edges.collect()}
    w1 = sorted(map(str, random_walks(diamond_edges, 2, 4, seed=7,
                                      draw="h60").collect()))
    w2 = sorted(map(str, random_walks(diamond_edges, 2, 4, seed=7,
                                      draw="h60").collect()))
    assert w1 == w2
    for r in random_walks(diamond_edges, 2, 4, seed=7,
                          draw="h60").collect():
        for a, b in zip(r["walk"], r["walk"][1:]):
            assert (a, b) in edge_set

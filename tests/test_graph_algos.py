"""PageRank, traversal, clustering coefficient, community reports."""

import math

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.algos.pagerank import pagerank
from graphrag_rs_spark.algos import traversal


@pytest.fixture(scope="module")
def chain_edges(spark):
    # a-b-c-d path plus isolated pair e-f
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")],
        "src string, dst string").cache()


def test_pagerank_uniform_on_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=20).collect()}
    for v in ranks.values():
        assert math.isclose(v, 1 / 3, rel_tol=1e-6)


def test_pagerank_sums_to_one_with_dangling(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string")
    ranks = pagerank(edges, iterations=15).collect()
    total = sum(r["rank"] for r in ranks)
    assert math.isclose(total, 1.0, rel_tol=1e-6)
    by = {r["node"]: r["rank"] for r in ranks}
    assert by["c"] > by["b"] > by["a"]


def test_bfs_levels(spark, chain_edges):
    src = spark.createDataFrame([("a",)], "node string")
    lv = {r["node"]: r["level"]
          for r in traversal.bfs_levels(chain_edges, src, max_depth=5).collect()}
    assert lv == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_depth_bound(spark, chain_edges):
    src = spark.createDataFrame([("a",)], "node string")
    lv = {r["node"]: r["level"]
          for r in traversal.bfs_levels(chain_edges, src, max_depth=2).collect()}
    assert lv == {"a": 0, "b": 1, "c": 2}


def test_shortest_path(chain_edges):
    assert traversal.shortest_path_length(chain_edges, "a", "d") == 3
    assert traversal.shortest_path_length(chain_edges, "a", "f") is None


def test_ego_network(spark, chain_edges):
    edges = {(r["src"], r["dst"])
             for r in traversal.ego_network(chain_edges, "b", radius=1).collect()}
    assert edges == {("a", "b"), ("b", "c")}


def test_degree_stats(spark, chain_edges):
    d = {r["node"]: (r["in_degree"], r["out_degree"], r["degree"])
         for r in traversal.degree_stats(chain_edges).collect()}
    assert d["a"] == (0, 1, 1)
    assert d["b"] == (1, 1, 2)


def test_clustering_coefficient(spark):
    # triangle a-b-c plus pendant d
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string")
    cc = {r["node"]: r["clustering"]
          for r in traversal.clustering_coefficient(edges).collect()}
    assert math.isclose(cc["a"], 1.0, rel_tol=1e-9)
    assert math.isclose(cc["c"], 2 * 1 / (3 * 2), rel_tol=1e-9)
    assert cc["d"] == 0.0


def test_community_reports(spark):
    from graphrag_rs_spark.stages.reports import community_reports
    communities = spark.createDataFrame(
        [("PERSON_a", 0, "c1"), ("PERSON_b", 0, "c1"), ("ORG_x", 0, "c1"),
         ("PERSON_z", 0, "c2")],
        "entity_id string, level int, community string")
    entities = spark.createDataFrame(
        [("PERSON_a", "Alice", "PERSON", 5), ("PERSON_b", "Bob", "PERSON", 3),
         ("ORG_x", "Xcorp", "ORGANIZATION", 9), ("PERSON_z", "Zed", "PERSON", 1)],
        "entity_id string, name string, entity_type string, mention_count long")
    flat = spark.createDataFrame(
        [("ch1", "PERSON_a", "KNOWS", "PERSON_b"),
         ("ch1", "PERSON_a", "WORKS_FOR", "ORG_x"),
         ("ch2", "PERSON_z", "KNOWS", "PERSON_a")],
        "chunk_id string, subj string, pred string, obj string")
    reports = {r["community_id"]: r
               for r in community_reports(communities, entities, flat).collect()}
    assert set(reports) == {"c1"}  # c2 below min_size
    r = reports["c1"]
    assert r["size"] == 3
    assert r["n_internal_edges"] == 2
    assert "Alice" in r["title"] and "Xcorp" in r["title"]
    assert "PERSON: Alice, Bob" in r["summary"]
    assert "ORGANIZATION: Xcorp" in r["summary"]

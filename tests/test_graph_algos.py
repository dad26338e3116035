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


def test_incremental_pagerank_warm_start(spark):
    """G5: warm-starting from the converged solution is a fixed point —
    2 more iterations barely move the ranks; a graph delta re-converges
    to the full recompute's solution."""
    from graphrag_rs_spark.algos.pagerank import pagerank, incremental_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    base = pagerank(edges, iterations=30)
    warm = incremental_pagerank(edges, base, iterations=2)
    b = {r["node"]: r["rank"] for r in base.collect()}
    w = {r["node"]: r["rank"] for r in warm.collect()}
    assert all(abs(b[n] - w[n]) < 1e-5 for n in b)

    # delta: add a node; warm incremental ≈ cold full recompute
    edges2 = edges.union(spark.createDataFrame(
        [("c", "d"), ("d", "a")], "src string, dst string"))
    inc = {r["node"]: r["rank"]
           for r in incremental_pagerank(edges2, base, iterations=15).collect()}
    full = {r["node"]: r["rank"]
            for r in pagerank(edges2, iterations=30).collect()}
    assert all(abs(inc[n] - full[n]) < 1e-4 for n in full)


def test_hierarchical_summary_tree(spark):
    """Q11: 6 chunks, fanout 2 → levels 0..3, one root, n_leaves adds up."""
    from graphrag_rs_spark.retrieval.summarize import (
        hierarchical_summary, document_summaries)

    chunks = spark.createDataFrame(
        [("d1", i, f"Sentence {i} one. Sentence {i} two.") for i in range(6)]
        + [("d2", 0, "Only chunk here.")],
        "doc_id string, chunk_seq int, content string")
    tree = hierarchical_summary(chunks, fanout=2)
    rows = tree.collect()
    by_level = {}
    for r in rows:
        by_level.setdefault((r["doc_id"], r["level"]), []).append(r)
    assert len(by_level[("d1", 0)]) == 6
    assert len(by_level[("d1", 1)]) == 3
    assert len(by_level[("d1", 2)]) == 2
    assert len(by_level[("d1", 3)]) == 1
    assert ("d2", 1) not in by_level          # single chunk → no parents
    root = by_level[("d1", 3)][0]
    assert root["n_leaves"] == 6
    # children ordered by idx: the level-1 node 0 summarizes chunks 0,1
    n10 = [r for r in by_level[("d1", 1)] if r["node_idx"] == 0][0]
    assert n10["summary"] == "Sentence 0 one. Sentence 1 one."
    docs = {r["doc_id"]: r for r in document_summaries(tree).collect()}
    assert docs["d1"]["n_leaves"] == 6
    assert docs["d2"]["summary"] == "Only chunk here."


@pytest.fixture(scope="module")
def ref_test_graph(spark):
    """The reference's traversal test graph (traversal.rs:574-636):
    A->B, B->C, A->D; traversal treats edges bidirectionally
    (get_neighbors, traversal.rs:486-510)."""
    return spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("A", "D")], "src string, dst string")


def test_multi_source_bfs_min_distances(spark, ref_test_graph):
    """traversal.rs:677-691 test_multi_source_bfs + FIFO first-discovery
    distances = min over seeds."""
    seeds = spark.createDataFrame([("A",), ("C",)], "node string")
    got = {r["node"]: r["level"] for r in traversal.multi_source_bfs(
        ref_test_graph, seeds, max_depth=3).collect()}
    assert got == {"A": 0, "C": 0, "B": 1, "D": 1}


def test_find_all_paths_golden(ref_test_graph):
    """traversal.rs:692-706 test_find_all_paths: A→C over the
    bidirectional graph — exactly [A, B, C]."""
    paths = {tuple(r["path"]): r["weight"] for r in traversal.all_paths(
        ref_test_graph, "A", "C", max_depth=4, directed=False).collect()}
    assert paths == {("A", "B", "C"): 2.0}


def test_all_paths_enumerates_and_respects_bounds(spark):
    # diamond + tail: A-B, B-C, A-C, C-D (undirected)
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")],
        "src string, dst string")
    got = {tuple(r["path"]) for r in traversal.all_paths(
        edges, "A", "D", max_depth=4, directed=False).collect()}
    assert got == {("A", "C", "D"), ("A", "B", "C", "D")}
    # node-count bound (analytics.rs:381 path.len() >= max_depth)
    short = {tuple(r["path"]) for r in traversal.all_paths(
        edges, "A", "D", max_depth=3, directed=False).collect()}
    assert short == {("A", "C", "D")}
    # source == target → the trivial single-node path
    self_path = traversal.all_paths(
        edges, "A", "A", max_depth=3, directed=False).collect()
    assert [tuple(r["path"]) for r in self_path] == [("A",)]


def test_all_paths_weighted(spark):
    edges = spark.createDataFrame(
        [("A", "B", 0.5), ("B", "C", 0.25), ("A", "C", 1.5)],
        "src string, dst string, conf double")
    got = {tuple(r["path"]): r["weight"] for r in traversal.all_paths(
        edges, "A", "C", max_depth=3, directed=True,
        weight_col="conf").collect()}
    assert got == {("A", "B", "C"): 0.75, ("A", "C"): 1.5}


def test_query_focused_subgraph_golden(spark, ref_test_graph):
    """traversal.rs:707-716 test_query_focused_subgraph: seeds=[A],
    hops=2 → every node and every edge of the test graph, min
    distances from A."""
    seeds = spark.createDataFrame([("A",)], "node string")
    nodes, sub_edges = traversal.query_focused_subgraph(
        ref_test_graph, seeds, expansion_hops=2)
    got = {r["node"]: r["level"] for r in nodes.collect()}
    assert got == {"A": 0, "B": 1, "D": 1, "C": 2}
    assert {(r["src"], r["dst"]) for r in sub_edges.collect()} == \
        {("A", "B"), ("B", "C"), ("A", "D")}


def test_query_focused_subgraph_per_seed_edges(spark):
    """An edge bridging two different seeds' balls is EXCLUDED unless one
    seed covers both endpoints (the reference unions per-seed ego edge
    sets, traversal.rs:521-573)."""
    # path graph: S1 - x - y - S2 with hops=1: edge (x, y) bridges the
    # two balls but belongs to neither seed's 1-hop ego network
    edges = spark.createDataFrame(
        [("S1", "x"), ("x", "y"), ("y", "S2")], "src string, dst string")
    seeds = spark.createDataFrame([("S1",), ("S2",)], "node string")
    nodes, sub_edges = traversal.query_focused_subgraph(
        edges, seeds, expansion_hops=1)
    assert {r["node"] for r in nodes.collect()} == {"S1", "x", "y", "S2"}
    assert {(r["src"], r["dst"]) for r in sub_edges.collect()} == \
        {("S1", "x"), ("y", "S2")}


def test_hits_golden_bipartite(spark):
    from graphrag_rs_spark.algos.hits import hits
    # p2 links both authorities; symmetric wings
    e = spark.createDataFrame(
        [("p1", "a1"), ("p2", "a1"), ("p2", "a2"), ("p3", "a2")],
        "src string, dst string")
    out = {r.node: r for r in hits(e, iterations=3).collect()}
    assert len(out) == 5
    assert out["p2"].hub == 0.5
    assert out["p1"].hub == 0.25 and out["p3"].hub == 0.25
    assert out["a1"].authority == 0.5 and out["a2"].authority == 0.5
    # sources hold no authority, sinks no hub score
    assert all(out[p].authority == 0.0 for p in ("p1", "p2", "p3"))
    assert all(out[a].hub == 0.0 for a in ("a1", "a2"))


def test_hits_cycle_is_uniform(spark):
    from graphrag_rs_spark.algos.hits import hits
    e = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "1")], "src string, dst string")
    for r in hits(e, iterations=4).collect():
        assert r.hub == round(1 / 3, 8) and r.authority == round(1 / 3, 8)


def test_lpa_two_triangles_bridge(spark):
    from graphrag_rs_spark.algos.lpa import lpa_communities
    e = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
         ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
         ("a3", "b1")],
        "src string, dst string")
    out = {r.node: r.community for r in
           lpa_communities(e, iterations=4).collect()}
    assert out == {"a1": "a1", "a2": "a1", "a3": "a1",
                   "b1": "b1", "b2": "b1", "b3": "b1"}


def test_lpa_star_collapses_to_center(spark):
    from graphrag_rs_spark.algos.lpa import lpa_communities
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], "src string, dst string")
    out = {r.node: r.community for r in
           lpa_communities(e, iterations=3).collect()}
    assert set(out.values()) == {"a"} and len(out) == 4


def test_lpa_self_vote_damps_bipartite_oscillation(spark):
    from graphrag_rs_spark.algos.lpa import lpa_communities
    # 4-cycle is bipartite: pure synchronous LPA 2-cycles on it; the
    # self-vote pins the fixed point (everything -> min label "a")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string")
    for iters in (3, 4):
        out = {r.node: r.community for r in
               lpa_communities(e, iterations=iters).collect()}
        assert set(out.values()) == {"a"} and len(out) == 4


def test_hits_zero_iterations_returns_uniform_init(spark):
    from graphrag_rs_spark.algos.hits import hits
    e = spark.createDataFrame([("a", "b"), ("b", "c")],
                              "src string, dst string")
    out = {r.node: r for r in hits(e, iterations=0).collect()}
    assert len(out) == 3
    # zero-iteration output honors the L1 contract: uniform 1/N, sums
    # to 1 (ADVICE r3 — the raw all-ones init violated the invariant)
    third = round(1.0 / 3.0, 8)
    assert all(r.hub == third and r.authority == third
               for r in out.values())
    assert abs(sum(r.hub for r in out.values()) - 1.0) < 1e-6

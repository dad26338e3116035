"""Golden tests for closeness/betweenness centrality (analytics.rs:182-267).

Closed-form cases (P4 path, S4 star, the tie diamond) plus an
independent plain-Python Brandes cross-check on the ring+chord graph —
the same algorithm written the textbook way (dict BFS + exact fractions,
no per-level rounding), so a shared bug in the DataFrame version cannot
hide."""

from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.algos.centrality import (
    betweenness_centrality, brandes_forward, closeness_centrality)
from tests.conftest import spark  # noqa: F401


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string")


def _nodes(spark, nodes):
    return spark.createDataFrame([(str(n),) for n in nodes], "node string")


P4 = [(0, 1), (1, 2), (2, 3)]
S4 = [("c", "a"), ("c", "b"), ("c", "d")]
DIAMOND = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]


def test_forward_sigma_counts_all_shortest_paths(spark):
    fwd = brandes_forward(_edges(spark, DIAMOND), _nodes(spark, ["a"]),
                          max_depth=3)
    got = {r.node: (r.dist, r.sigma) for r in fwd.collect()}
    assert got == {"a": (0, 1), "b": (1, 1), "c": (1, 1), "d": (2, 2)}


def test_closeness_path_graph(spark):
    out = closeness_centrality(_edges(spark, P4),
                               _nodes(spark, [0, 1, 2, 3]), max_depth=3)
    got = {r.node: (r.reachable, r.total_dist, r.closeness)
           for r in out.collect()}
    assert got["0"] == (3, 6, 0.5)
    assert got["1"] == (3, 4, 0.75)
    assert got["3"] == (3, 6, 0.5)


def test_closeness_depth_cap_and_unreachable(spark):
    # isolated pair far from the seed: depth cap 1 sees one neighbor
    out = closeness_centrality(_edges(spark, P4), _nodes(spark, [0]),
                               max_depth=1)
    row = out.collect()[0]
    assert (row.reachable, row.total_dist, row.closeness) == (1, 1, 1.0)
    # singleton source with no edges at all → closeness 0.0
    lonely = closeness_centrality(_edges(spark, P4), _nodes(spark, ["z"]),
                                  max_depth=2)
    assert lonely.collect()[0].closeness == 0.0


def test_betweenness_path_graph(spark):
    out = betweenness_centrality(_edges(spark, P4),
                                 _nodes(spark, [0, 1, 2, 3]),
                                 max_depth=3, n_total=4)
    got = {r.node: (r.delta_sum, r.betweenness) for r in out.collect()}
    # middle nodes mediate pairs (0,2),(0,3) resp (1,3),(0,3): BC = 2/3
    assert got == {"1": (4.0, pytest.approx(2 / 3, abs=1e-6)),
                   "2": (4.0, pytest.approx(2 / 3, abs=1e-6))}


def test_betweenness_star_center_is_one(spark):
    out = betweenness_centrality(_edges(spark, S4),
                                 _nodes(spark, ["a", "b", "c", "d"]),
                                 max_depth=2, n_total=4)
    got = {r.node: r.betweenness for r in out.collect()}
    assert got == {"c": pytest.approx(1.0, abs=1e-6)}


def test_betweenness_diamond_splits_ties_fractionally(spark):
    out = betweenness_centrality(_edges(spark, DIAMOND),
                                 _nodes(spark, ["a", "b", "c", "d"]),
                                 max_depth=3, n_total=4)
    got = {r.node: r.betweenness for r in out.collect()}
    # every node sits on exactly half of the one 2-path pair it mediates
    assert got == {n: pytest.approx(1 / 6, abs=1e-6)
                   for n in ("a", "b", "c", "d")}


def test_betweenness_sampled_sources_rescale(spark):
    out = betweenness_centrality(_edges(spark, P4), _nodes(spark, [0]),
                                 max_depth=3, n_total=4)
    got = {r.node: (r.delta_sum, r.betweenness) for r in out.collect()}
    # delta from s=0 only: node1=2, node2=1; scale = (4/1)/((3)(2))
    assert got == {"1": (2.0, pytest.approx(4 / 3, abs=1e-6)),
                   "2": (1.0, pytest.approx(2 / 3, abs=1e-6))}


def _python_brandes(adj, sources, max_depth):
    """Textbook Brandes (exact floats, no rounding) → per-node delta sum."""
    acc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, d in delta.items():
            if v != s:
                acc[v] += d
    return acc


def test_betweenness_matches_independent_brandes_on_ring(spark):
    n = 20
    pairs = [(i, (i + 1) % n) for i in range(n)] \
        + [(i, (i + 2) % n) for i in range(n)] \
        + [(i, (2 * i + 1) % n) for i in range(n)]
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[str(a)].add(str(b))
            adj[str(b)].add(str(a))
    sources = [str(i) for i in range(0, n, 3)]
    expect = _python_brandes(adj, sources, max_depth=4)
    out = betweenness_centrality(_edges(spark, pairs),
                                 _nodes(spark, sources),
                                 max_depth=4, n_total=n)
    got = {r.node: r.delta_sum for r in out.collect()}
    for node, d in expect.items():
        if d > 1e-9:
            assert got[node] == pytest.approx(d, abs=1e-4), node
    assert set(got) == {v for v, d in expect.items() if d > 1e-9}

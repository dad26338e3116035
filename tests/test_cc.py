"""Connected components (algos/cc.py): known graphs + properties."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.algos.cc import connected_components


@pytest.fixture(params=[0, 2_000_000],
                ids=["distributed-loop", "driver-unionfind"])
def cc_threshold(request):
    """Run every CC test through BOTH execution paths (they must agree)."""
    return request.param


def _cc(spark, edges, nodes=None, threshold=0):
    e = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        e = e.filter(F.lit(False))
    n = (spark.createDataFrame([(x,) for x in nodes], "node string")
         if nodes is not None else None)
    rows = connected_components(e, nodes=n,
                                driver_threshold=threshold).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in comps.values()}, {
        r["node"]: r["component"] for r in rows}


def test_cc_chain(spark, cc_threshold):
    comps, labels = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")],
                        threshold=cc_threshold)
    assert comps == {frozenset("abcd")}
    assert all(v == "a" for v in labels.values())  # min-id label


def test_cc_two_components_and_isolated(spark, cc_threshold):
    comps, labels = _cc(
        spark, [("a", "b"), ("c", "d")], nodes=["a", "b", "c", "d", "e"],
        threshold=cc_threshold)
    assert comps == {frozenset("ab"), frozenset("cd"), frozenset("e")}
    assert labels["e"] == "e"


def test_cc_star_and_cycle(spark, cc_threshold):
    edges = [("h", "a"), ("h", "b"), ("h", "c"),       # star
             ("x", "y"), ("y", "z"), ("z", "x")]       # cycle
    comps, _ = _cc(spark, edges, threshold=cc_threshold)
    assert comps == {frozenset("habc"), frozenset("xyz")}


def test_cc_duplicate_and_reversed_edges(spark, cc_threshold):
    comps, _ = _cc(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")],
                   threshold=cc_threshold)
    assert comps == {frozenset("ab")}


def test_cc_byte_budget_demotes_driver_path(spark, monkeypatch):
    """Row count under threshold but bytes over budget → distributed path.

    A handful of very wide string ids fits any row cap but blows a tiny
    byte budget; the fast path must demote instead of collecting them.
    """
    import graphrag_rs_spark.algos.cc as ccmod

    def boom(*a, **k):  # pragma: no cover - fails the test if reached
        raise AssertionError("driver union-find must not run")

    monkeypatch.setattr(ccmod, "_driver_union_find", boom)
    hub = "a" * 512  # star graph: converges in O(1) contraction rounds
    wide = [(hub, "b" * 512 + str(i))
            for i in range(12_000)]  # > sample size so the estimate kicks in
    e = spark.createDataFrame(wide, "src string, dst string")
    out = ccmod.connected_components(
        e, driver_threshold=2_000_000, driver_byte_budget=1024)
    assert out.select("component").distinct().count() == 1


def test_cc_long_path_converges(spark, cc_threshold):
    """Path graph: alternating stars converge in O(log n) rounds.

    16 nodes → ~4 contraction rounds; long enough to exercise repeated
    rounds, short enough that per-round job latency (~5s in local mode)
    keeps the distributed variant fast.  (1000-node paths verified
    manually; per-round wall cost is fixed, rounds grow as log n.)
    """
    ids = [f"n{i:02d}" for i in range(16)]
    edges = list(zip(ids, ids[1:]))
    comps, labels = _cc(spark, edges, threshold=cc_threshold)
    assert comps == {frozenset(ids)}
    assert set(labels.values()) == {"n00"}

"""Connected components (algos/cc.py): known graphs + properties."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.algos.cc import connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        e = e.filter(F.lit(False))
    n = (spark.createDataFrame([(x,) for x in nodes], "node string")
         if nodes is not None else None)
    rows = connected_components(e, nodes=n).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in comps.values()}, {
        r["node"]: r["component"] for r in rows}


def test_cc_chain(spark):
    comps, labels = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert comps == {frozenset("abcd")}
    assert all(v == "a" for v in labels.values())  # min-id label


def test_cc_two_components_and_isolated(spark):
    comps, labels = _cc(
        spark, [("a", "b"), ("c", "d")], nodes=["a", "b", "c", "d", "e"])
    assert comps == {frozenset("ab"), frozenset("cd"), frozenset("e")}
    assert labels["e"] == "e"


def test_cc_star_and_cycle(spark):
    edges = [("h", "a"), ("h", "b"), ("h", "c"),       # star
             ("x", "y"), ("y", "z"), ("z", "x")]       # cycle
    comps, _ = _cc(spark, edges)
    assert comps == {frozenset("habc"), frozenset("xyz")}


def test_cc_duplicate_and_reversed_edges(spark):
    comps, _ = _cc(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")])
    assert comps == {frozenset("ab")}


def test_cc_long_path_converges(spark):
    """Path of 40 nodes: alternating stars converge in O(log n) rounds."""
    ids = [f"n{i:02d}" for i in range(40)]
    edges = list(zip(ids, ids[1:]))
    comps, labels = _cc(spark, edges)
    assert comps == {frozenset(ids)}
    assert set(labels.values()) == {"n00"}

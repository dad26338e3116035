"""Link prediction (algos/linkpred.py) — golden values on tiny graphs."""

from __future__ import annotations

import math

from graphrag_rs_spark.algos.linkpred import (hub_centers_skipped,
                                              link_prediction)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_path_graph_predicts_endpoints(spark):
    # a - b - c: the only candidate is (a, c) through center b
    out = link_prediction(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.common) == ("a", "c", 1)
    assert r.jaccard == 1.0  # |Γa ∪ Γc| = {b}
    assert r.adamic_adar == round(1.0 / math.log(2.0), 6)


def test_existing_edges_are_excluded(spark):
    # triangle a-b-c plus pendant c-d: (a,b) share c but ARE an edge;
    # (a,d) and (b,d) share c and are predicted
    out = link_prediction(_edges(
        spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])).collect()
    pairs = {(r.u, r.v) for r in out}
    assert pairs == {("a", "d"), ("b", "d")}
    w = round(1.0 / math.log(3.0), 6)  # deg(c) = 3
    for r in out:
        assert r.common == 1 and r.adamic_adar == w
        # Γ(a)={b,c}, Γ(d)={c} → jaccard = 1/(2+1-1)
        assert r.jaccard == 0.5


def test_symmetrization_and_duplicate_edges(spark):
    # both orientations + a duplicate must not double-count the wedge
    out = link_prediction(_edges(
        spark, [("a", "b"), ("b", "a"), ("c", "b"), ("a", "b")])).collect()
    assert len(out) == 1 and out[0].common == 1


def test_hub_cap_skips_star_center(spark):
    star = [("h", f"n{i}") for i in range(6)]
    assert link_prediction(_edges(spark, star), max_degree=4).count() == 0
    assert hub_centers_skipped(_edges(spark, star), max_degree=4) == 1
    # uncapped, the star yields C(6,2) leaf pairs
    assert link_prediction(_edges(spark, star), max_degree=6,
                           top_k=100).count() == 15


def test_ranking_and_top_k(spark):
    edges = [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"),
             ("c", "z1")]
    # (z1,z2) share {a,b} (deg 2 each): aa = 2/ln2 ≈ 2.885 — the top pair;
    # (a,b) share {z1,z2} (deg 3, 2):  aa = 1/ln3 + 1/ln2 ≈ 2.353
    out = link_prediction(_edges(spark, edges), top_k=1).collect()
    assert len(out) == 1
    assert (out[0].u, out[0].v, out[0].common) == ("z1", "z2", 2)
    assert out[0].adamic_adar == round(2.0 / math.log(2.0), 6)
    full = {(r.u, r.v): r for r in
            link_prediction(_edges(spark, edges), top_k=10).collect()}
    ab = full[("a", "b")]
    assert ab.common == 2
    assert ab.adamic_adar == round(1 / math.log(3) + 1 / math.log(2), 6)

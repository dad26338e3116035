"""Corpus-level KG rollup (corpus/knowledge_graph.rs): importance,
co-occurrence relation accumulation, stats goldens."""

from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.operators.corpus_kg import (
    corpus_kg_stats,
    cross_doc_relations,
    global_entities,
)

SCHEMA = ("document_id long, cluster_id string, canonical_name string, "
          "entity_type string, name string")


def _members(spark, rows):
    return spark.createDataFrame(
        [(d, c, c, "concept", n) for d, c, n in rows], SCHEMA)


def test_global_entity_importance(spark):
    # cluster 'alice': 3 members in 2 docs, 2 aliases.
    m = _members(spark, [
        (1, "alice", "alice"), (1, "alice", "alice_smith"),
        (2, "alice", "alice"), (2, "bob", "bob")])
    out = {r.cluster_id: r for r in global_entities(m).collect()}
    a = out["alice"]
    # exact-match quirk: document_frequency = member count (3).
    assert a.document_frequency == 3 and a.total_mentions == 3
    assert a.spread == 2 and a.n_aliases == 2
    lnm = round(math.log(3) * 1e6)
    exp = ((lnm / 1e6 + 1.0) * 0.4 + (lnm / 1e6 + 1.0) * 0.3
           + 2 * 0.3) / 3.0
    assert a.importance == pytest.approx(round(exp, 6))
    assert a.is_cross_document == 1
    assert out["bob"].is_cross_document == 0
    # ln(1) = 0 -> bob importance = (0.4 + 0.3 + 0.3) / 3.
    assert out["bob"].importance == pytest.approx(round(1 / 3, 6))


def test_cross_doc_relation_confidence(spark):
    # pair (a,b) shares 4 docs -> 0.7 + 0.3 = 1.0 capped; (a,c) one
    # doc -> 0.7; duplicate members in one doc count once.
    rows = [(d, "a", "a") for d in (1, 2, 3, 4)]
    rows += [(d, "b", "b") for d in (1, 2, 3, 4)]
    rows += [(1, "c", "c"), (1, "c", "c2")]
    out = {(r.source, r.target): r
           for r in cross_doc_relations(_members(spark, rows)).collect()}
    ab = out[("a", "b")]
    assert ab.document_frequency == 4
    assert ab.confidence == 1.0  # 0.7 + 3*0.1 capped at 1.0
    assert out[("a", "c")].document_frequency == 1
    assert out[("a", "c")].confidence == pytest.approx(0.7)
    # canonicalized: only source < target pairs exist.
    assert ("b", "a") not in out and ("c", "a") not in out


def test_corpus_stats(spark):
    m = _members(spark, [
        (1, "a", "a"), (1, "b", "b"), (2, "a", "a")])
    ents = global_entities(m)
    rels = cross_doc_relations(m)
    s = corpus_kg_stats(ents, rels).collect()[0]
    assert s.total_entities == 2 and s.total_relations == 1
    assert s.cross_document_entities == 1      # 'a' has 2 members
    assert s.single_document_entities == 1
    assert s.avg_entity_connections == pytest.approx(1.0)  # 2*1/2
    assert s.graph_density == pytest.approx(1.0)           # 1/(2*1/2)
    # the reference's documented simplification (:324-333).
    assert s.largest_component_size == 2

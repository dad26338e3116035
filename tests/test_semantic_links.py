"""R6 semantic edges / L4 semantic merge pairs over hash embeddings."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.stages.semantic_links import (
    entity_embeddings, semantic_edges, semantic_merge_pairs)


@pytest.fixture(scope="module")
def entities(spark):
    rows = [
        ("PERSON_alice_johnson", "Alice Johnson", "PERSON", 0.9),
        ("PERSON_alice_johnson_phd", "Alice Johnson PhD", "PERSON", 0.8),
        ("ORGANIZATION_alice_johnson", "Alice Johnson", "ORGANIZATION", 0.7),
        ("PERSON_bob_smith", "Bob Smith", "PERSON", 0.9),
        ("LOCATION_paris", "Paris", "LOCATION", 0.95),
    ]
    return spark.createDataFrame(
        rows,
        "entity_id string, name string, entity_type string, "
        "confidence double").cache()


def test_entity_embeddings_unit_vectors(entities):
    emb = entity_embeddings(entities, dim=16).collect()
    assert len(emb) == 5
    for r in emb:
        assert abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-4


def test_semantic_merge_pairs_same_type_gate(entities):
    pairs = semantic_merge_pairs(entities, min_sim=0.7, dim=16,
                                 n_planes=0).collect()
    keys = {(r["src"], r["dst"]) for r in pairs}
    # shared-name same-type entities link
    assert ("PERSON_alice_johnson",
            "PERSON_alice_johnson_phd") in keys
    # identical names across types do NOT (same_type_only)
    assert not any("ORGANIZATION" in a and "PERSON" in b
                   or "PERSON" in a and "ORGANIZATION" in b
                   for a, b in keys)
    assert all(r["sim"] >= 0.7 for r in pairs)


def test_semantic_merge_feeds_canonical_map(entities):
    from graphrag_rs_spark.stages.canonicalize import canonical_map
    extra = semantic_merge_pairs(entities, min_sim=0.7, dim=16,
                                 n_planes=0)
    cmap = {r["entity_id"]: r["canonical_id"]
            for r in canonical_map(entities, extra_edges=extra).collect()}
    # the two PERSON Alices collapse to one canonical id
    assert cmap["PERSON_alice_johnson"] == cmap["PERSON_alice_johnson_phd"]
    assert cmap["PERSON_bob_smith"] != cmap["PERSON_alice_johnson"]


def test_semantic_edges_knn_triples(entities):
    edges = semantic_edges(entities, k=2, min_sim=0.1, dim=16).collect()
    assert edges
    for r in edges:
        assert r["pred"] == "RELATED_TO"
        assert r["subj"] < r["obj"]            # undirected, canonical order
        assert 0.1 <= r["confidence"] <= 1.0
    keys = {(r["subj"], r["obj"]) for r in edges}
    assert len(keys) == len(edges)             # no duplicate pairs

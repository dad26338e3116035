"""Q13 ROGRAG: fuzzy matching + syntactic query decomposition."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rograg import decomposer
from graphrag_rs_spark.rograg.fuzzy_matcher import match_query, match_chunks


# ------------------------------------------------------------ decomposer

def test_single_clause_passthrough():
    # DecompositionResult::single_query (decomposer.rs:716-729):
    # original query preserved intact -> id "single", Entity, conf 1.0
    r = decomposer.decompose("tell me everything")
    assert not r.is_decomposed
    assert r.confidence == 1.0
    assert r.subqueries[0].id == "single"
    assert r.subqueries[0].query_type == "Entity"
    assert r.subqueries[0].text == "tell me everything"


def test_multi_clause_split_and_types():
    r = decomposer.decompose(
        "who founded Acme and when was it founded, why did it grow")
    assert r.is_decomposed
    assert r.confidence == 0.7
    texts = [s.text for s in r.subqueries]
    assert texts[0].startswith("who founded Acme")
    types = {s.text: s.query_type for s in r.subqueries}
    assert types[texts[0]] == "Entity"
    assert any(t == "Temporal" for t in types.values())
    assert any(t == "Causal" for t in types.values())
    # priorities decay 1.0, 0.9, 0.8 ... (decomposer.rs:598)
    prios = [s.priority for s in r.subqueries]
    assert prios == sorted(prios, reverse=True)
    assert prios[0] == 1.0 and prios[1] == pytest.approx(0.9)


def test_clause_type_table():
    cases = {
        "what person runs it": "Entity",
        "what is graphrag": "Definitional",
        "when did it launch": "Temporal",
        "it happened because of x": "Causal",
        "how do they connect": "Relationship",
        "compare a with b": "Comparative",
        "its revenue": "Attribute",
    }
    for clause, expected in cases.items():
        assert decomposer.classify_clause_type(clause) == expected, clause


def test_can_decompose():
    assert decomposer.can_decompose("a and b")
    assert decomposer.can_decompose("x, y")
    assert not decomposer.can_decompose("simple")


# ---------------------------------------------------------- fuzzy match

@pytest.fixture(scope="module")
def tiny_entities(spark):
    return spark.createDataFrame(
        [("PERSON_alice", "Alice Johnson", "PERSON"),
         ("PERSON_alicia", "Alicia Jonson", "PERSON"),
         ("ORG_acme", "Acme Corp", "ORGANIZATION"),
         ("LOC_paris", "Paris", "LOCATION")],
        "entity_id string, name string, entity_type string")


def test_exact_match_boosted(tiny_entities):
    rows = match_query("alice johnson", tiny_entities).collect()
    assert rows[0]["id"] == "PERSON_alice"
    assert rows[0]["similarity"] == 1.0
    assert rows[0]["match_type"] == "ExactEntity"


def test_partial_match_scoring(tiny_entities):
    # "Alicia Jonson" vs "alice johnson": shares no exact word →
    # jaccard 0, containment 0; levenshtein("alice johnson",
    # "alicia jonson") = 3 → lev_sim = 1 - 3/13; blended × 0.2 × 0.9,
    # rounded to 6dp BEFORE ranking (the repo-wide ranking invariant)
    rows = {r["id"]: r for r in
            match_query("alice johnson", tiny_entities,
                        threshold=0.1).collect()}
    expected = round((1 - 3 / 13) * 0.2 * 0.9, 6)
    assert rows["PERSON_alicia"]["similarity"] == pytest.approx(expected)
    assert rows["PERSON_alicia"]["match_type"] == "PartialEntity"


def test_type_match(tiny_entities):
    rows = {r["id"]: r for r in
            match_query("any person here", tiny_entities,
                        threshold=0.9).collect()}
    # word_overlap({any,person,here},{person}) = 1/1 → sim 0.7
    assert rows["type_PERSON_alice"]["similarity"] == pytest.approx(0.7)
    assert rows["type_PERSON_alicia"]["match_type"] == "SemanticEntity"
    assert "type_ORG_acme" not in rows


def test_chunk_matching(spark):
    chunks = spark.createDataFrame(
        [("c1", "alice johnson works at acme corp"),
         ("c2", "completely unrelated text about weather")],
        "chunk_id string, content string")
    rows = {r["id"]: r for r in
            match_chunks("alice johnson acme", chunks,
                         threshold=0.5).collect()}
    # keyword overlap: |{alice,johnson,acme}∩chunk words| / min(3, 6) = 1.0
    assert rows["keywords_c1"]["similarity"] == pytest.approx(1.0)
    assert "keywords_c2" not in rows


def test_topk_deterministic(tiny_entities):
    a = [r["id"] for r in match_query("person", tiny_entities).collect()]
    b = [r["id"] for r in match_query("person", tiny_entities).collect()]
    assert a == b                       # similarity desc, id asc tie-break

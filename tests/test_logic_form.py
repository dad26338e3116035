"""Golden tests for ROGRAG logic-form retrieval (rograg/logic_form.rs)."""

from graphrag_rs_spark.rograg.logic_form import (
    logic_form_retrieve, parse_logic_form)
from tests.conftest import spark  # noqa: F401

ENTS = [("spark", "TECH"), ("hash value", "CONCEPT"),
        ("fast table", "CONCEPT")]
EDGES = [("hash value", "spark", "related_to", 0.9)]


def _run(spark, queries):
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)],
        "query_id long, query string")
    ents = spark.createDataFrame(ENTS, "name string, entity_type string")
    edges = spark.createDataFrame(
        EDGES, "src string, dst string, rel_type string, confidence double")
    return qdf, logic_form_retrieve(qdf, ents, edges).collect()


def test_parse_first_match_wins_and_greedy_quirk(spark):
    qdf = spark.createDataFrame(
        [(0, "what is spark?"),
         (1, "what is spark related to hash"),
         (2, "when did spark happen"),
         (3, "hello world")],
        "query_id long, query string")
    got = {r.query_id: (r.predicate, r.x, r.y)
           for r in parse_logic_form(qdf).collect()}
    # the greedy (.+)\?? keeps the trailing '?' inside the argument
    assert got[0] == ("is", "spark?", None)
    # "what is ..." pattern outranks "related to" (reference order)
    assert got[1] == ("is", "spark related to hash", None)
    assert got[2] == ("happened", "spark", None)
    assert 3 not in got                      # unparseable → absent


def test_is_bindings_and_confidence(spark):
    _, rows = _run(spark, ["what is spark", "what is the hash",
                           "what is spark?"])
    got = {(r.query_id, r.value): r.confidence for r in rows}
    assert got[(0, "spark (TECH)")] == 1.0          # exact
    assert got[(1, "hash value (CONCEPT)")] == 0.8  # containment
    # trailing '?' captured into the arg → contains() finds nothing
    assert not any(qid == 2 for qid, _ in got)


def test_related_direct_edge_and_fallback(spark):
    _, rows = _run(spark, ["how is spark related to hash",
                           "how is spark connected to fast"])
    got = {r.query_id: (r.variable, r.value, r.confidence) for r in rows}
    # edge stored (hash value, spark) matches in either direction;
    # value leads with the QUERY's first entity
    assert got[0] == ("R", "spark related_to hash value", 0.9)
    assert got[1] == (
        "R", "No direct relationship found between spark and fast table",
        0.3)


def test_compare_binding(spark):
    _, rows = _run(spark, ["compare spark with fast table"])
    assert rows[0].variable == "comparison"
    assert rows[0].value == "spark is a TECH while fast table is a CONCEPT"
    assert rows[0].confidence == 0.7


def test_unresolved_side_yields_nothing(spark):
    _, rows = _run(spark, ["how is spark related to zzz",
                           "compare zzz with qqq",
                           "when did spark happen",
                           "why does spark cause hash"])
    assert rows == []                        # TODO-stub predicates too

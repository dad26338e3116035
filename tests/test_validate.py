"""Pipeline phase validation (evaluation/pipeline_validation.rs):
golden replays of the reference's unit fixtures plus planted-defect
branch coverage."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.stages.validate import (
    pipeline_validation_report,
    validate_document_processing,
)

CHUNK_SCHEMA = ("doc_id long, chunk_id long, content string, "
                "chapter string, keywords array<string>, summary string")


def test_rust_document_processing_fixture(spark):
    """pipeline_validation.rs:601-628 — two chunks covering 40/41
    chars of the doc pass every check."""
    docs = spark.createDataFrame(
        [(1, "This is test content with multiple words.")],
        "doc_id long, text string")
    chunks = spark.createDataFrame(
        [(1, 10, "This is test", None, [], None),
         (1, 11, "content with multiple words.", None, [], None)],
        CHUNK_SCHEMA)
    out = validate_document_processing(docs, chunks).collect()[0]
    assert out.passed == 1
    assert out.n_chunks == 2
    assert out.coverage == pytest.approx(round(40 / 41, 6))
    assert out.metadata_ratio == 0.0
    assert out.avg_chunk_size == 20.0


def test_document_processing_failures(spark):
    docs = spark.createDataFrame(
        [(1, "full text content here"), (2, "another full document"),
         (3, "no chunks for this one")],
        "doc_id long, text string")
    chunks = spark.createDataFrame(
        [(1, 10, "full text content here", "ch", [], None),
         (2, 20, "tiny", None, [], None),   # coverage 4/21 < 0.9
         (2, 21, "  ", None, [], None)],    # empty-trim chunk
        CHUNK_SCHEMA)
    out = {r.doc_id: r
           for r in validate_document_processing(docs, chunks).collect()}
    assert out[1].passed == 1 and out[1].metadata_ratio == 1.0
    assert out[2].passed == 0 and out[2].empty_chunks == 1
    # no chunks at all -> chunks_created fails (rs:64-74).
    assert out[3].passed == 0 and out[3].n_chunks == 0
    assert out[3].coverage is None and out[3].avg_chunk_size == 0.0


def _report(spark, ents, rels, mens=None):
    docs = spark.createDataFrame([(1, "text")], "doc_id long, text string")
    chunks = spark.createDataFrame(
        [(1, 10, "alice works at stanford", None, [], None)],
        CHUNK_SCHEMA)
    entities = spark.createDataFrame(
        ents, "entity_id string, name string, entity_type string, "
              "confidence double")
    mentions = spark.createDataFrame(
        mens or [], "entity_id string, chunk_id long")
    relationships = spark.createDataFrame(
        rels, "source string, target string, relation_type string, "
              "confidence double")
    out = pipeline_validation_report(
        docs, chunks, entities, mentions, relationships)
    return {(r.phase, r.item): r for r in out.collect()}


def test_rust_entity_extraction_fixture(spark):
    """pipeline_validation.rs:631-655 — one clean entity passes the
    entity phase."""
    r = _report(spark,
                ents=[("e1", "Alice", "person", 0.9)],
                rels=[("e1", "e1", "self", 0.5)],
                mens=[("e1", 10)])
    assert r[("pipeline", "entity_phase")].passed == 1
    assert r[("entity", "avg_confidence")].value == pytest.approx(0.9)
    assert r[("entity", "avg_mentions_per_entity")].value == 1.0


def test_planted_defects_fail_their_checks(spark):
    r = _report(
        spark,
        ents=[("e1", "Alice", "person", 0.9),
              ("e2", "", "person", 0.5),        # empty name
              ("e3", "Carol", "", 1.5)],        # no type + bad conf
        rels=[("e1", "ghost", "knows", 0.5),    # orphan target
              ("e2", "e3", "", -0.25)],         # no type + bad conf
        mens=[("e1", 10), ("e1", 999)])         # dangling chunk ref
    assert r[("entity", "confidence_scores_valid")].passed == 0
    assert r[("entity", "entity_types_populated")].value == 1.0
    assert r[("entity", "entity_names_valid")].value == 1.0
    assert r[("entity", "entity_mentions_valid")].value == 1.0
    assert r[("relationship", "relationship_entities_exist")].value == 1.0
    assert r[("relationship", "relationship_confidence_valid")].passed == 0
    assert r[("pipeline", "overall")].passed == 0
    # 12 checks total; count the failed ones: e_badc, e_notype,
    # e_noname, m_bad, r_badc, r_notype, r_orphan fail -> 5 pass of
    # the first 9, graph checks: connectivity 2/3 > 0.1 ok,
    # entities/chunk 3/1 in range, non-empty -> all 3 pass.
    assert r[("pipeline", "overall")].value == 5.0
    assert r[("pipeline", "total_checks")].value == 12.0


def test_graph_connectivity_check(spark):
    # 3 entities, 0 relationships -> connectivity fails + rel phase
    # fails (relationships_extracted).
    r = _report(spark,
                ents=[("e1", "A", "t", 0.5), ("e2", "B", "t", 0.5),
                      ("e3", "C", "t", 0.5)],
                rels=[])
    assert r[("relationship", "relationships_extracted")].passed == 0
    assert r[("graph", "graph_connectivity")].passed == 0
    assert r[("pipeline", "graph_phase")].passed == 0


def test_report_on_empty_tables_reports_failures_not_crash(spark):
    # ANSI divide-by-zero regression: empty entity/relationship tables
    # must yield failed checks, not a SparkArithmeticException
    from graphrag_rs_spark.stages.validate import pipeline_validation_report
    docs = spark.createDataFrame([("d1", "text")], "doc_id string, text string")
    chunks = spark.createDataFrame([], "doc_id string, chunk_id string")
    entities = spark.createDataFrame(
        [], "entity_id string, name string, entity_type string, confidence double")
    mentions = spark.createDataFrame([], "entity_id string, chunk_id string")
    rels = spark.createDataFrame(
        [], "source string, target string, relation_type string, confidence double")
    rows = {(r.phase, r.item): r for r in pipeline_validation_report(
        docs, chunks, entities, mentions, rels).collect()}
    assert rows[("entity", "entities_extracted")].passed == 0
    assert rows[("relationship", "relationships_extracted")].passed == 0
    assert rows[("graph", "graph_not_empty")].passed == 1   # nd > 0

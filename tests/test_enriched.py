"""Golden tests for enriched metadata retrieval (retrieval/enriched.rs)."""

import pytest

from graphrag_rs_spark.retrieval.enriched import enriched_metadata_search
from tests.conftest import spark  # noqa: F401

CHUNK_SCHEMA = ("chunk_id string, keywords array<string>, "
                "summary string, chapter string, section string")


def _search(spark, queries, chunks, base=None, schema=CHUNK_SCHEMA):
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)],
        "query_id long, query string")
    cdf = spark.createDataFrame(chunks, schema)
    bdf = None
    if base is not None:
        bdf = spark.createDataFrame(
            base, "query_id long, chunk_id string, score double")
    out = enriched_metadata_search(qdf, cdf, bdf)
    return {(r.query_id, r.chunk_id): r.score for r in out.collect()}


C1 = ("c1", ["spark", "fast"], "spark is fast", "chapter 1", "1.2")
C2 = ("c2", ["hash"], None, None, None)
C3 = ("c3", [], "no keywords here", None, None)


def test_keyword_boost_and_default_base(spark):
    got = _search(spark, ["tell me about spark performance"],
                  [C1, C2, C3])
    # c1: 1 of 4 query words matched → 0.3/4 boost over 0.5 base;
    # c2 boosts 0 (≤0.05 cut); c3 filtered (no keywords/entities)
    assert got == {(0, "c1"): pytest.approx(0.575)}


def test_structure_summary_and_base_cap(spark):
    got = _search(spark, ["chapter 1 spark"], [C1, C2],
                  base=[(0, "c1", 0.8)])
    # kw 1/2·0.3 + chapter-ref 0.5·0.2 + summary 0.15 = 0.4;
    # 0.8 + 0.4 caps at 1.0
    assert got[(0, "c1")] == 1.0


def test_summary_needs_half_the_query_words(spark):
    # 4 query words, only 1 in summary → below max(2,1), no 0.15
    got = _search(spark, ["tell me about spark performance"], [C1])
    assert got[(0, "c1")] == pytest.approx(0.575)
    # 2 query words, 1 in summary → meets max(1,1)
    got = _search(spark, ["spark things"], [C1])
    assert got[(0, "c1")] == pytest.approx(0.5 + 0.15 + 0.15)


def test_completeness_bonus_above_seven_ninths(spark):
    rich_schema = ("chunk_id string, keywords array<string>, summary "
                   "string, chapter string, section string, subsection "
                   "string, topic string, structural_level string")
    rich = [("c9", ["spark"], "s", "ch", "se", "su", "to", "lv")]
    got = _search(spark, ["spark only"], rich, schema=rich_schema)
    # kw 1/2·0.3 + summary miss + completeness 7/9 > 0.7 → +0.05
    assert got[(0, "c9")] == pytest.approx(0.5 + 0.15 + 0.05)


def test_part_and_section_reference_patterns(spark):
    got = _search(spark, ["part iv of spark section 1.2"], [C1])
    # refs: 'part iv' + 'section 1.2' — neither FIELD contains its ref
    # (contains is field-contains-ref, reference :340-378) → struct 0;
    # kw 1/3·0.3; summary: 1 hit ≥ max(3/2=1, 1) → +0.15
    assert got[(0, "c1")] == pytest.approx(0.5 + 0.1 + 0.15)

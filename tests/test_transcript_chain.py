"""Pins for the composed transcript-chain contract queries (round 5).

The kg_sql_transcript_* family runs the REAL north-rule prefix
(assemble → chunk → extract → rollup/mentions/triples/canonical) on a
fixed seeded transcript set and is hash-verified against fully composed
DuckDB oracles by the driver gate.  These pins catch a stage refactor
that silently shifts the chain's output BEFORE the driver does, and
document the expected magnitudes.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"  # ignored: the chain is sf-independent


@pytest.fixture(scope="module")
def chain(spark):
    q = entry.queries()
    return {
        "entities": q["kg_sql_transcript_entities"](spark, SF),
        "mentions": q["kg_sql_transcript_mentions"](spark, SF),
        "triples": q["kg_sql_transcript_triples"](spark, SF),
        "canonical": q["kg_sql_transcript_canonical"](spark, SF),
    }


def test_chain_cardinalities_pinned(chain):
    assert chain["entities"].count() == 576
    assert chain["mentions"].count() == 1979
    assert chain["triples"].count() == 10392          # (subj,pred,obj) groups
    assert chain["triples"].agg(
        F.sum("n_context")).collect()[0][0] == 13958  # total pair mentions
    assert chain["canonical"].count() == 576


def test_entities_spot_values(chain):
    rows = {r["entity_id"]: r for r in chain["entities"].collect()}
    # a known seeded character: two-word PERSON, phase-3 confidence 0.8
    grace = rows.get("PERSON_gracewatson")
    assert grace is not None and grace["confidence"] == pytest.approx(0.8)
    # every entity id is type-prefixed and normalized
    assert all(k.split("_", 1)[0] in
               ("PERSON", "ORGANIZATION", "LOCATION") for k in rows)
    # confidences respect the default 0.7 cut
    assert chain["entities"].where(F.col("confidence") < 0.7).count() == 0


def test_mentions_lie_inside_chunks(spark, chain):
    # every mention offset must index a real occurrence of some text:
    # end > start and both non-negative, chunk ids are doc_seq-shaped
    bad = chain["mentions"].where(
        (F.col("start_offset") < 0)
        | (F.col("end_offset") <= F.col("start_offset"))).count()
    assert bad == 0
    assert chain["mentions"].where(
        ~F.col("chunk_id").rlike(r"^conv_\d+_\d+$")).count() == 0


def test_canonical_map_is_total_and_idempotent(chain):
    cmap = chain["canonical"]
    ents = chain["entities"].select("entity_id")
    # total: one row per entity
    assert cmap.join(ents, "entity_id").count() == ents.count()
    # idempotent: every canonical target maps to itself
    targets = cmap.select(
        F.col("canonical_id").alias("entity_id")).distinct()
    fixed = cmap.join(targets, "entity_id") \
        .where(F.col("entity_id") != F.col("canonical_id")).count()
    assert fixed == 0

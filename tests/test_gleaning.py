"""Gleaning loop (E8-E10) with the deterministic fake LM.

The fake reveals pattern-extracted entities in md5 waves, so multi-round
behavior, per-chunk dropout, the E9 longer-description merge, mention
re-scanning, and relationship resolution all execute for real.
"""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.stages.gleaning import (
    FakeGleaningLM, entity_id_for, gleaning_extract,
    parse_extraction_response)

TEXTS = [
    ("c1", "Alice Johnson met Bob Smith at the Acme Corporation office "
           "in Paris. Alice Johnson presented the migration plan and "
           "Bob Smith reviewed the rollout schedule with Carol Danvers."),
    ("c2", "The Globex Industries team from Berlin shipped the indexing "
           "service. David Miller wrote the storage layer for Globex "
           "Industries while visiting London."),
    ("c3", "it was quiet. nothing notable happened here at all."),
]


@pytest.fixture(scope="module")
def chunks(spark):
    return spark.createDataFrame(
        TEXTS, "chunk_id string, content string").cache()


@pytest.fixture(scope="module")
def extracted(chunks):
    ents, mentions, rels = gleaning_extract(
        chunks, FakeGleaningLM, max_rounds=4)
    return ents.collect(), mentions.collect(), rels.collect()


def test_parse_response_fallback_ladder():
    body = ('{"entities": [{"name": "X", "entity_type": "PERSON", '
            '"description": "d"}], "relationships": []}')
    for wrapped in (body,
                    f"```json\n{body}\n```",
                    f"Sure! Here you go:\n{body}\nHope that helps."):
        ents, rels = parse_extraction_response(wrapped)
        assert [e["name"] for e in ents] == ["X"]
    assert parse_extraction_response("not json at all") == ([], [])


def test_waves_union_to_full_pattern_extraction(extracted):
    """All waves eventually surface: gleaning converges to the same name
    set one-shot pattern extraction produces."""
    ents, _, _ = extracted
    fake = FakeGleaningLM()
    want = set()
    for cid, text in TEXTS:
        want |= {(cid, n.lower()) for n, _ in fake._all_entities(text)}
    got = {(r["chunk_id"], r["name"].lower()) for r in ents}
    assert got == want
    assert len(want) > 3          # fixture really exercises the loop


def test_multiround_merge_kept_longer_description(extracted):
    """The fake re-emits a known entity with a longer description in
    continuation rounds; E9 merge must keep it."""
    ents, _, _ = extracted
    longer = [r for r in ents
              if "seen again with more" in r["description"]]
    assert longer                  # ≥2 waves happened AND merge kept max


def test_entity_ids_match_reference_normalization(extracted):
    ents, _, _ = extracted
    for r in ents:
        assert r["entity_id"] == entity_id_for(
            r["name"], r["entity_type"])
        assert r["confidence"] == 0.9


def test_mentions_point_at_real_spans(chunks, extracted):
    _, mentions, _ = extracted
    text_by_chunk = {r["chunk_id"]: r["content"]
                     for r in chunks.collect()}
    ents, _, _ = extracted
    name_by_id = {(r["chunk_id"], r["entity_id"]): r["name"]
                  for r in ents}
    assert mentions
    for m in mentions:
        t = text_by_chunk[m["chunk_id"]]
        span = t[m["start_offset"]:m["end_offset"]]
        name = name_by_id[(m["chunk_id"], m["entity_id"])]
        if m["confidence"] == 0.9:
            assert span == name
        else:
            assert m["confidence"] == 0.85
            assert span.lower() == name.lower()


def test_relationships_resolved_and_deduped(extracted):
    ents, _, rels = extracted
    ids = {(r["chunk_id"], r["entity_id"]) for r in ents}
    keys = [(r["chunk_id"], r["subj"], r["pred"], r["obj"])
            for r in rels]
    assert len(keys) == len(set(keys))
    for r in rels:
        assert (r["chunk_id"], r["subj"]) in ids
        assert (r["chunk_id"], r["obj"]) in ids


def test_gleaning_deterministic_across_partitioning(spark, chunks):
    e1, _, _ = gleaning_extract(chunks, FakeGleaningLM, max_rounds=4)
    e2, _, _ = gleaning_extract(chunks.repartition(7), FakeGleaningLM,
                                max_rounds=4)
    k1 = {(r["chunk_id"], r["entity_id"], r["description"])
          for r in e1.collect()}
    k2 = {(r["chunk_id"], r["entity_id"], r["description"])
          for r in e2.collect()}
    assert k1 == k2


def test_chunk_with_no_wave0_entities_still_extracts(spark):
    """Regression: a chunk whose entities ALL hash to wave >= 1 must not
    drop out of the loop with nothing emitted (the round-1 branch used to
    emit literal wave 0 only, so the empty found-list looped forever)."""
    text = ("Frank Castle met Henry Ford in London. Frank Castle and "
            "Henry Ford argued about Madrid.")
    fake = FakeGleaningLM()
    ents = fake._all_entities(text)
    assert ents, "fixture text must extract entities"
    assert all(fake._wave(n) >= 1 for n, _ in ents), \
        "fixture precondition: every entity hashes to wave >= 1"
    chunks = spark.createDataFrame([("w1", text)],
                                   "chunk_id string, content string")
    out, _, _ = gleaning_extract(chunks, FakeGleaningLM, max_rounds=4)
    got = {r["name"] for r in out.collect()}
    assert {n for n, _ in ents} <= got


# ---- adversarial wire-format hardening (E8 seam) -----------------------

def _adversarial_lm_factory():
    """Built inside a function so cloudpickle ships it BY VALUE to the
    Python workers (a test-module top-level class pickles by reference
    to 'test_gleaning', which executors cannot import)."""

    class AdversarialGleaningLM:
        """Deterministic hostile LM: unparseable garbage, duplicate names
        re-emitted every round with changing descriptions, junk records,
        ghost relationship endpoints, and completion checks that never say
        YES.  Personas keyed by the chunk text prefix."""

        SPAM_ENTS = [("Alice", "PERSON"), ("Bob", "PERSON"),
                     ("Paris", "LOCATION")]

        def complete(self, prompts):
            return [self._one(p) for p in prompts]

        @staticmethod
        def _payload(ents, rels):
            import json as _json
            return _json.dumps({
                "entities": [
                    {"name": n, "entity_type": t, "description": d}
                    for n, t, d in ents],
                "relationships": [
                    {"source": s, "target": t, "description": d,
                     "strength": 0.7} for s, t, d in rels],
            })

        def _one(self, prompt):
            text, found = FakeGleaningLM._split(prompt)
            if prompt.startswith("Answer YES"):
                if text.startswith("JUNK") and found:
                    return "YES"
                return "NO, never satisfied, keep going!!!"
            if text.startswith("GARBAGE"):
                return 'Sure! here{ "entities": [ broken and never closed'
            if text.startswith("SPAM"):
                known = [(n, t) for n, t in self.SPAM_ENTS
                         if n.lower() in found]
                fresh = [(n, t) for n, t in self.SPAM_ENTS
                         if n.lower() not in found][:1]
                pad = "x" * (3 * len(found))
                ents = [(n, t, f"{n} desc {pad}") for n, t in known + fresh]
                return self._payload(ents, [])
            if text.startswith("JUNK"):
                import json as _json
                body = _json.dumps({
                    "entities": [
                        {"name": "Carol", "entity_type": "PERSON",
                         "description": "good"},
                        {"name": ""}, {"entity_type": "X"}, 42,
                        {"name": "Acme", "entity_type": "ORGANIZATION",
                         "description": "good"},
                    ],
                    "relationships": [
                        {"source": "Carol", "target": "Acme",
                         "description": "works_at", "strength": 0.9},
                        {"source": "GHOST", "target": "Acme",
                         "description": "haunts", "strength": 0.1},
                        {"source": "Carol"}, "junk",
                    ],
                })
                return f"```json\n{body}\n```"
            return "{}"


    return AdversarialGleaningLM


def test_adversarial_lm_never_breaks_the_loop(spark):
    chunks = spark.createDataFrame(
        [("g1", "GARBAGE nothing parseable here"),
         ("s1", "SPAM Alice met Bob in Paris"),
         ("j1", "JUNK Carol works at Acme")],
        "chunk_id string, content string")
    ents, mentions, rels = gleaning_extract(
        chunks, _adversarial_lm_factory(), max_rounds=5)
    e = ents.collect()
    by_chunk = {}
    for r in e:
        by_chunk.setdefault(r["chunk_id"], {})[r["name"]] = r

    # garbage chunk: parser never throws, emits nothing, loop terminates
    assert "g1" not in by_chunk
    # junk records filtered; good ones kept
    assert set(by_chunk["j1"]) == {"Carol", "Acme"}
    # duplicate re-emission across rounds dedups per (chunk, lower name),
    # E9 keeps the LONGEST (= latest round's padded) description.  The
    # reference stops only on a literally-empty round
    # (gleaning_extractor.rs:189-196), so the known-entity re-emissions
    # of rounds 4-5 are merged, not dropped — final pad is x*9
    assert set(by_chunk["s1"]) == {"Alice", "Bob", "Paris"}
    assert by_chunk["s1"]["Alice"]["description"] == "Alice desc " + "x" * 9
    assert by_chunk["s1"]["Bob"]["description"] == "Bob desc " + "x" * 9
    # one row per (chunk, name): no dup leakage
    keys = [(r["chunk_id"], r["name"].lower()) for r in e]
    assert len(keys) == len(set(keys))

    # ghost endpoints dropped; the real relationship survives
    rl = rels.collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in rl] == \
        [("PERSON_carol", "works_at", "ORGANIZATION_acme")]

    # mentions only where names occur in the text
    m = {(r["chunk_id"], r["entity_id"]) for r in mentions.collect()}
    assert ("s1", "PERSON_alice") in m and ("j1", "PERSON_carol") in m

"""I4 conflict resolution (reference graph/incremental/conflict.rs)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.streaming import conflict


@pytest.fixture(scope="module")
def entity_frames(spark):
    existing = spark.createDataFrame(
        [("PERSON_alice", "Alice", "PERSON", 0.9, 3),
         ("ORG_acme", "Acme", "ORGANIZATION", 0.6, 2),
         ("LOC_paris", "Paris", "LOCATION", 0.8, 1)],
        "entity_id string, name string, entity_type string, "
        "confidence double, mention_count long")
    incoming = spark.createDataFrame(
        [("ORG_acme", "Acme Corp", "ORGANIZATION", 0.8, 4),   # conflict, new wins merge
         ("PERSON_alice", "alice", "PERSON", 0.9, 2),         # conflict, tie → existing
         ("PERSON_bob", "Bob", "PERSON", 0.7, 1)],            # new key
        "entity_id string, name string, entity_type string, "
        "confidence double, mention_count long")
    return existing, incoming


def _by_id(df):
    return {r["entity_id"]: r.asDict() for r in df.collect()}


def test_entity_keep_existing(entity_frames):
    existing, incoming = entity_frames
    out = _by_id(conflict.resolve_entity_conflicts(
        existing, incoming, "keep_existing"))
    assert set(out) == {"PERSON_alice", "ORG_acme", "LOC_paris", "PERSON_bob"}
    assert out["ORG_acme"]["name"] == "Acme"            # existing won
    assert out["ORG_acme"]["confidence"] == 0.6
    assert out["PERSON_bob"]["name"] == "Bob"           # non-conflict passes
    assert out["LOC_paris"]["mention_count"] == 1


def test_entity_keep_new(entity_frames):
    existing, incoming = entity_frames
    out = _by_id(conflict.resolve_entity_conflicts(
        existing, incoming, "keep_new"))
    assert out["ORG_acme"]["name"] == "Acme Corp"       # incoming replaced
    assert out["ORG_acme"]["mention_count"] == 4
    assert out["PERSON_alice"]["name"] == "alice"
    assert out["LOC_paris"]["name"] == "Paris"          # untouched


def test_entity_merge(entity_frames):
    existing, incoming = entity_frames
    out = _by_id(conflict.resolve_entity_conflicts(
        existing, incoming, "merge"))
    # strictly-higher new confidence takes name (conflict.rs:178-183)
    assert out["ORG_acme"]["name"] == "Acme Corp"
    assert out["ORG_acme"]["confidence"] == 0.8
    assert out["ORG_acme"]["mention_count"] == 6        # counts add
    # equal confidence → existing keeps the name (strict > in reference)
    assert out["PERSON_alice"]["name"] == "Alice"
    assert out["PERSON_alice"]["mention_count"] == 5


def test_entity_merge_is_order_independent(spark, entity_frames):
    existing, incoming = entity_frames
    a = _by_id(conflict.resolve_entity_conflicts(
        conflict.resolve_entity_conflicts(existing, incoming, "merge"),
        incoming, "keep_existing"))
    b = _by_id(conflict.resolve_entity_conflicts(
        existing, incoming, "merge"))
    assert a == b                     # idempotent re-application under keep_existing


def test_unknown_strategy_raises(entity_frames):
    existing, incoming = entity_frames
    with pytest.raises(ValueError, match="unknown conflict strategy"):
        conflict.resolve_entity_conflicts(existing, incoming, "vibes")


def test_custom_resolver(entity_frames):
    from pyspark.sql import functions as F
    existing, incoming = entity_frames
    # parity with conflict.rs with_custom_resolver: caller-supplied rule
    out = _by_id(conflict.resolve_entity_conflicts(
        existing, incoming, "custom",
        custom=lambda both: both.select(
            "entity_id", F.upper("new_name").alias("name"),
            "entity_type", "confidence", "mention_count")))
    assert out["ORG_acme"]["name"] == "ACME CORP"
    assert out["ORG_acme"]["confidence"] == 0.6         # untouched fields kept


def test_relationship_merge(spark):
    existing = spark.createDataFrame(
        [("a", "KNOWS", "b", 0.5, 2, [11, 22]),
         ("a", "KNOWS", "c", 0.5, 1, [11])],
        "subj string, pred string, obj string, confidence double, "
        "n_context int, context_keys array<long>")
    incoming = spark.createDataFrame(
        [("a", "WORKS_FOR", "b", 0.9, 2, [22, 33]),      # re-types the edge
         ("b", "KNOWS", "c", 0.4, 1, [44])],             # new edge
        "subj string, pred string, obj string, confidence double, "
        "n_context int, context_keys array<long>")
    out = {(r["subj"], r["obj"]): r.asDict()
           for r in conflict.resolve_relationship_conflicts(
               existing, incoming, "merge").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["pred"] == "WORKS_FOR"                     # higher conf re-typed
    assert ab["confidence"] == 0.9
    assert ab["context_keys"] == [11, 22, 33]            # union, sorted
    assert ab["n_context"] == 3
    assert out[("a", "c")]["pred"] == "KNOWS"            # untouched
    assert out[("b", "c")]["confidence"] == 0.4          # pass-through


def test_relationship_keep_strategies(spark):
    existing = spark.createDataFrame(
        [("a", "KNOWS", "b", 0.5, 1, [1])],
        "subj string, pred string, obj string, confidence double, "
        "n_context int, context_keys array<long>")
    incoming = spark.createDataFrame(
        [("a", "LEADS", "b", 0.4, 1, [2])],
        "subj string, pred string, obj string, confidence double, "
        "n_context int, context_keys array<long>")
    keep_e = conflict.resolve_relationship_conflicts(
        existing, incoming, "keep_existing").collect()[0]
    assert keep_e["pred"] == "KNOWS" and keep_e["context_keys"] == [1]
    keep_n = conflict.resolve_relationship_conflicts(
        existing, incoming, "keep_new").collect()[0]
    assert keep_n["pred"] == "LEADS" and keep_n["context_keys"] == [2]
    # merge with LOWER new confidence: keep pred, still union contexts
    merged = conflict.resolve_relationship_conflicts(
        existing, incoming, "merge").collect()[0]
    assert merged["pred"] == "KNOWS"
    assert merged["context_keys"] == [1, 2]


# ---------------------------------------------------- property testing

from hypothesis import given, settings, strategies as st

_ENT = st.tuples(
    st.sampled_from(["e1", "e2", "e3", "e4"]),
    st.sampled_from(["Ann", "Bob", "Cal"]),
    st.sampled_from(["PERSON", "ORG"]),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32),
    st.integers(min_value=0, max_value=9),
)


def _dedup_by_id(rows):
    seen, out = set(), []
    for r in rows:
        if r[0] not in seen:
            seen.add(r[0])
            out.append(r)
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(_ENT, min_size=1, max_size=4),
       st.lists(_ENT, min_size=1, max_size=4))
def test_merge_upsert_properties(spark, a_rows, b_rows):
    """Merge keeps the key set = union of key sets, confidence never
    decreases, and mention counts add on conflicts (associativity of the
    underlying max/sum is what makes increments order-free)."""
    schema = ("entity_id string, name string, entity_type string, "
              "confidence double, mention_count long")
    a_rows, b_rows = _dedup_by_id(a_rows), _dedup_by_id(b_rows)
    existing = spark.createDataFrame(a_rows, schema)
    incoming = spark.createDataFrame(b_rows, schema)
    out = {r["entity_id"]: r.asDict()
           for r in conflict.resolve_entity_conflicts(
               existing, incoming, "merge").collect()}
    ea = {r[0]: r for r in a_rows}
    eb = {r[0]: r for r in b_rows}
    assert set(out) == set(ea) | set(eb)
    for k, row in out.items():
        conf_a = ea[k][3] if k in ea else None
        conf_b = eb[k][3] if k in eb else None
        assert row["confidence"] == pytest.approx(
            max(v for v in (conf_a, conf_b) if v is not None))
        if k in ea and k in eb:
            assert row["mention_count"] == ea[k][4] + eb[k][4]


def test_relationship_multi_pred_sides_compact_to_one_row_per_edge(spark):
    """Regression: the (subj, pred, obj)-grained fold can carry several
    preds per edge; resolving on (subj, obj) must pre-fold each side, not
    fan out duplicate edge rows through the conflict join."""
    existing = spark.createDataFrame(
        [("a", "KNOWS", "b", 0.5, 1, [1]),
         ("a", "LEADS", "b", 0.7, 1, [2])],          # two preds, same edge
        "subj string, pred string, obj string, confidence double, "
        "n_context int, context_keys array<long>")
    incoming = spark.createDataFrame(
        [("a", "WORKS_FOR", "b", 0.6, 1, [3]),
         ("a", "MANAGES", "b", 0.6, 1, [4])],        # two preds, same edge
        "subj string, pred string, obj string, confidence double, "
        "n_context int, context_keys array<long>")
    rows = conflict.resolve_relationship_conflicts(
        existing, incoming, "merge").collect()
    assert len(rows) == 1                            # one row per (subj, obj)
    r = rows[0].asDict()
    # existing side folds to LEADS@0.7; incoming folds to WORKS_FOR@0.6
    # (pred desc breaks the 0.6 tie deterministically); 0.6 not > 0.7
    assert r["pred"] == "LEADS" and r["confidence"] == 0.7
    assert r["context_keys"] == [1, 2, 3, 4] and r["n_context"] == 4

"""Oracle (single-process reference pipeline) self-consistency +
the CC-closure-of-greedy property (SURVEY.md §7 risk 2)."""

import random

from hypothesis import example, given, settings, strategies as st

from graphrag_rs_spark import reference_logic as rl
from graphrag_rs_spark.config import DEFAULT_CONFIG
from graphrag_rs_spark.oracle import (
    assemble_documents, link_entities_cc, link_entities_greedy,
    run_oracle_pipeline,
)


def test_assemble_preserves_turn_text(tiny_rows):
    docs = assemble_documents(tiny_rows)
    by_doc = {d["doc_id"]: d for d in docs}
    for r in tiny_rows:
        d = by_doc[r["conv_id"]]
        off = next(o for o in d["turn_offsets"] if o["turn_idx"] == r["turn_idx"])
        assert d["content"][off["start"]:off["end"]] == r["text"]


def test_oracle_produces_triples(tiny_oracle):
    assert tiny_oracle.entities
    assert tiny_oracle.triples
    assert tiny_oracle.canonical_triples
    # canonicalization only shrinks the triple set
    assert len(tiny_oracle.canonical_triples) <= len(tiny_oracle.triples)


def test_oracle_deterministic(tiny_rows, tiny_oracle):
    again = run_oracle_pipeline(tiny_rows)
    assert again.triple_set() == tiny_oracle.triple_set()
    assert again.canonical_map == tiny_oracle.canonical_map


def test_canonical_map_links_typos(tiny_oracle):
    """datagen seeds Jon/Jhon ← John typos; at τ=0.85 they must link."""
    linked_names = set(tiny_oracle.canonical_map) | set(
        tiny_oracle.canonical_map.values())
    assert any("jon" in e or "jhon" in e for e in linked_names)


def _mk_entities(names):
    return [
        {"entity_id": f"PERSON_{rl.normalize_entity_name(n)}", "name": n,
         "entity_type": "PERSON", "confidence": 0.8}
        for n in names
    ]


def test_cc_is_closure_of_greedy():
    """Every greedy merge is a CC merge at the same τ (CC ⊇ greedy)."""
    rng = random.Random(7)
    first = ["John", "Jon", "Jhon", "Sarah", "Sara", "Robert", "Robbert"]
    last = ["Smith", "Smyth", "Jones"]
    names = list({f"{f} {l}" for f in first for l in last})
    rng.shuffle(names)
    ents = _mk_entities(names)
    cc = link_entities_cc(ents, DEFAULT_CONFIG)
    greedy = link_entities_greedy(ents, DEFAULT_CONFIG)

    def clusters(links, ents):
        root = {}
        for e in ents:
            eid = e["entity_id"]
            root[eid] = links.get(eid, eid)
        # map members by canonical
        out = {}
        for k, v in root.items():
            out.setdefault(v, set()).add(k)
        return out

    cc_cl = clusters(cc, ents)
    gr_cl = clusters(greedy, ents)
    # every greedy cluster is contained in exactly one CC cluster
    for members in gr_cl.values():
        containing = [c for c in cc_cl.values() if members <= c]
        assert len(containing) == 1


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from(
    ["John Smith", "Jon Smith", "Jhon Smith", "Acme Corp", "Acme Inc",
     "Sarah Jones", "Sara Jones", "Paris", "London"]),
    min_size=0, max_size=8, unique=True))
def test_cc_linking_order_independent(names):
    ents = _mk_entities(names)
    fwd = link_entities_cc(ents, DEFAULT_CONFIG)
    rev = link_entities_cc(list(reversed(ents)), DEFAULT_CONFIG)
    assert fwd == rev


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=400))
@example(text=" ")  # whitespace-only: reference drops blank chunks
def test_chunking_total_coverage(text):
    chunks = rl.chunk_text(text, 100, 20)
    if not text.strip():
        # reference behavior (text/mod.rs:123-168): chunks whose content
        # is whitespace-only are skipped, so blank text yields no chunks
        assert chunks == []
        return
    # leading/trailing all-blank chunks are dropped (strip guard), so the
    # kept chunks must bracket every non-blank character
    assert chunks[0].start <= len(text) - len(text.lstrip())
    assert chunks[-1].end >= len(text.rstrip())
    for ch in chunks:
        assert text[ch.start:ch.end] == ch.content
    # TRUE invariants only (confirmed counterexamples exist for the
    # stronger overlap/progress claims: an all-blank middle window is
    # DROPPED by the strip guard, so consecutive kept chunks may have a
    # blank-only gap; an overlap window can re-snap to the same sentence
    # boundary, so b.end == a.end is reachable):
    for a, b in zip(chunks, chunks[1:]):
        assert b.start > a.start        # strictly advancing starts
        assert b.end >= a.end           # never regressing ends
        # any gap between kept chunks is whitespace-only
        if b.start > a.end:
            assert text[a.end:b.start].strip() == ""
    # every non-blank character of the input is covered by some chunk
    covered = [False] * len(text)
    for ch in chunks:
        for i in range(ch.start, ch.end):
            covered[i] = True
    for i, c in enumerate(text):
        if not c.isspace():
            assert covered[i], i

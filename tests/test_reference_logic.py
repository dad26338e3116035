"""Golden per-operator tests — the reference's own asserted values
(FIXTURES.md §5; reference tests at string_similarity_linker.rs:471-621,
entity/mod.rs:1152-1196, text/chunking.rs:254-329)."""

from graphrag_rs_spark import reference_logic as rl


# --- similarity scalars (string_similarity_linker.rs golden values) -------

def test_levenshtein_golden():
    assert rl.levenshtein_distance("kitten", "sitting") == 3
    assert rl.levenshtein_distance("saturday", "sunday") == 3
    assert rl.levenshtein_distance("", "abc") == 3
    assert rl.levenshtein_distance("abc", "abc") == 0


def test_soundex_golden():
    assert rl.soundex("Robert") == "R163"
    assert rl.soundex("Rupert") == "R163"
    assert rl.soundex("Smith") == "S530"
    assert rl.soundex("Smyth") == "S530"


def test_jaro_winkler_golden():
    assert rl.jaro_winkler_similarity("martha", "marhta") > 0.9
    assert rl.jaro_winkler_similarity("abc", "abc") == 1.0
    assert rl.jaro_winkler_similarity("abc", "xyz") == 0.0


def test_normalize_golden():
    assert rl.normalize_string("John  Smith!") == "john smith"
    assert rl.normalize_string("  A  B  ") == "a b"


def test_jaccard():
    assert rl.jaccard_similarity("john smith", "smith john") == 1.0
    assert rl.jaccard_similarity("a b", "a c") == 1.0 / 3.0


def test_compute_similarity_exact_after_normalization():
    assert rl.compute_similarity("John  Smith!", "john smith", True) == 1.0


def test_compute_similarity_typo_above_threshold():
    # the canonicalization probe pairs of datagen must link at τ=0.85
    assert rl.compute_similarity("John Smith", "Jon Smith", True) >= 0.85
    assert rl.compute_similarity("Sarah Smith", "Sara Smith", True) >= 0.85


# --- chunking (text/mod.rs:123-168) ---------------------------------------

def test_chunk_bounds_and_coverage():
    text = ("A sentence here. " * 300).strip()
    chunks = rl.chunk_text(text, 1000, 200)
    assert chunks, "non-empty"
    for ch in chunks:
        assert 0 < len(ch.content) <= 1000 + 100  # size + boundary tolerance
        assert text[ch.start:ch.end] == ch.content
    # full coverage: first starts at 0, last ends at len(text)
    assert chunks[0].start == 0
    assert chunks[-1].end == len(text)
    # overlap: each next chunk starts before the previous end
    for a, b in zip(chunks, chunks[1:]):
        assert b.start <= a.end


def test_hierarchical_chunker():
    # paragraph separators preferred over mid-sentence cuts
    para = ("First paragraph sentence one is long enough to count. "
            "Second sentence also here.")
    text = "\n\n".join([para] * 10)
    chunks = rl.hierarchical_chunk_text(text, 200, 40)
    assert chunks
    for ch in chunks:
        assert text[ch.start:ch.end] == ch.content
        assert len(ch.content.strip()) >= rl.HIERARCHICAL_MIN_CHUNK
        assert len(ch.content) <= 200
    # boundaries land after separators (paragraph or sentence ends)
    for ch in chunks[:-1]:
        assert ch.content.endswith(("\n", ". ", "! ", "? ", "; ", ": ", " ")) \
            or ch.content.endswith(".")
    # forward progress + overlap
    for a, b in zip(chunks, chunks[1:]):
        assert b.start < a.end
        assert b.end > a.end


def test_hierarchical_chunker_short_text_below_min_dropped():
    assert rl.hierarchical_chunk_text("tiny.", 100, 10) == []


def test_chunk_short_text_single_chunk():
    chunks = rl.chunk_text("Short text.", 1000, 200)
    assert len(chunks) == 1
    assert chunks[0].content == "Short text."
    assert chunks[0].seq == 0


def test_chunk_ids_deterministic():
    # pinned golden offsets (a same-process double call of a pure
    # function can never fail — the golden is what catches regressions):
    # window stride re-snaps to the sentence boundary at 800-char steps
    text = "Some text. " * 500
    a = rl.chunk_text(text, 1000, 200)
    got = [(c.start, c.end, c.seq) for c in a]
    assert got[:3] == [(0, 1000, 0), (800, 1792, 1), (1592, 2584, 2)]
    assert len(got) == 7 and got[-1][2] == 6


# --- extraction (entity/mod.rs:97-889) ------------------------------------

TYPES = ("PERSON", "ORGANIZATION", "LOCATION")


def test_person_extraction_reference_case():
    # entity/mod.rs:1157-1178: persons extracted from the reference test text
    ents = rl.extract_from_chunk(
        "Entity Name works at Test Corp. Dr. Second Entity is a professor.",
        TYPES, 0.5)
    persons = [e for e in ents if e.entity_type == "PERSON"]
    assert persons
    names = {e.name for e in persons}
    assert "Entity Name" in names
    assert "Second Entity" in names


def test_relationship_extraction_reference_case():
    # entity/mod.rs:1181-1196
    text = "Entity Name works for Test Corp in Test City."
    ents = rl.extract_from_chunk(text, TYPES, 0.5)
    triples = rl.extract_chunk_triples(ents, text)
    assert triples


def test_extraction_quirks_match_reference():
    """The reference's rfind(' ')-based org recovery yields the bare suffix
    ("Corp") when the org name is mid-sentence (entity/mod.rs:534-538) —
    the transliteration must reproduce the quirk, not fix it."""
    text = "Dr. John Smith works for Acme Corp in New York."
    ents = {e.entity_id: e for e in rl.extract_from_chunk(text, TYPES, 0.7)}
    assert "PERSON_johnsmith" in ents
    assert ents["PERSON_johnsmith"].confidence > 0.85
    assert "ORGANIZATION_corp" in ents          # the quirk
    assert "LOCATION_newyork" in ents


def test_predicate_rules():
    assert rl.infer_relationship_type(
        "PERSON", "ORGANIZATION", "x works for y") == "WORKS_FOR"
    assert rl.infer_relationship_type(
        "PERSON", "ORGANIZATION", "x founded y") == "LEADS"
    assert rl.infer_relationship_type(
        "PERSON", "LOCATION", "born in") == "BORN_IN"
    assert rl.infer_relationship_type(
        "ORGANIZATION", "LOCATION", "headquartered") == "HEADQUARTERED_IN"
    assert rl.infer_relationship_type("PERSON", "PERSON", "married") == "MARRIED_TO"
    assert rl.infer_relationship_type("PERSON", "PERSON", "nothing") == "KNOWS"
    assert rl.infer_relationship_type("LOCATION", "LOCATION", "x") == "RELATED_TO"


def test_mentions_cover_all_occurrences():
    text = "Paris is nice. I love Paris."
    ents = rl.extract_from_chunk(text, TYPES, 0.5)
    paris = [e for e in ents
             if e.name == "Paris" and e.entity_type == "LOCATION"]
    assert len(paris) == 1  # per-chunk dedup keys on (name, type) — E4
    assert len(paris[0].mentions) == 2
    for m in paris[0].mentions:
        assert text[m.start:m.end] == "Paris"


def test_extraction_determinism():
    # pinned golden output (a same-process double call of a pure
    # function can never fail): ids in the deterministic sort order,
    # confidences with the reference's float accumulation quirks
    # (0.7999999999999999 = 0.5+0.1+0.1+0.1 in f64)
    text = "Alice Johnson met Dr. Bob Brown at Initech Inc in Boston."
    a = rl.extract_from_chunk(text, TYPES, 0.7)
    assert [(e.entity_id, e.confidence) for e in a] == [
        ("PERSON_alicejohnson", 0.7999999999999999),
        ("PERSON_bobbrown", 0.9),
        ("PERSON_initechinc", 0.7999999999999999),
        ("ORGANIZATION_inc", 0.9),
        ("LOCATION_boston", 0.9),
    ]


def test_entity_id_normalization():
    assert rl.make_entity_id("John  Smith!", "PERSON") == "PERSON_johnsmith"

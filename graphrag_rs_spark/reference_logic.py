"""Pure-Python transliteration of the reference engine's deterministic kernels.

No Spark imports here.  This module is the single source of truth for the
reference semantics; both the offline oracle (`graphrag_rs_spark.oracle`)
and the distributed Arrow-batched UDFs (`graphrag_rs_spark.stages.*`)
call these functions, so single-process and cluster runs agree by
construction.

Transliterated from (paths relative to /root/reference/):
  - chunker:      graphrag-core/src/text/mod.rs:123-168 (chunk_text),
                  :265-344 (boundary helpers)
  - extractor:    graphrag-core/src/entity/mod.rs:97-1149 (EntityExtractor)
  - triples:      graphrag-core/src/entity/mod.rs:822-889 + lib.rs:543-587
  - similarity:   graphrag-core/src/entity/string_similarity_linker.rs:130-409

Known, documented divergences from the Rust source:
  1. Offsets are Unicode code-point offsets, not UTF-8 byte offsets
     (identical on ASCII text; cleaner contract for a JVM/Arrow engine).
  2. The reference's per-chunk entity output order is Rust-HashMap order
     (nondeterministic across runs).  We fix a deterministic order:
     (first mention start offset, entity_id).  Triple (subj, obj)
     orientation follows that order, making the whole pipeline
     run-reproducible — a strict determinization of reference behavior.
  3. Float math is f64, not f32 (threshold comparisons in canonicalization
     can only become *more* precise).
"""

from __future__ import annotations

import re
from functools import lru_cache
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Chunking — text/mod.rs:123-168
# ---------------------------------------------------------------------------

_SENTENCE_ENDINGS = (".", "!", "?")


def _find_sentence_boundary(text: str, start: int, preferred_end: int) -> int | None:
    """text/mod.rs:283-325 — last sentence end in the final 200 chars."""
    if start >= preferred_end:
        return None
    window = text[start:preferred_end]
    search_start = max(len(window) - 200, 0)
    search_text = window[search_start:]
    last_boundary = None
    for i, ch in enumerate(search_text):
        if ch in _SENTENCE_ENDINGS:
            next_pos = i + 1
            if next_pos >= len(search_text) or search_text[next_pos].isspace():
                last_boundary = start + search_start + next_pos
    if last_boundary is not None:
        return last_boundary
    return _find_word_boundary(text, start, preferred_end)


def _find_word_boundary(text: str, start: int, preferred_end: int) -> int | None:
    """text/mod.rs:328-344 — last space in the final 50 chars."""
    if start >= preferred_end:
        return None
    window = text[start:preferred_end]
    search_start = max(len(window) - 50, 0)
    idx = window[search_start:].rfind(" ")
    if idx == -1:
        return None
    return start + search_start + idx


@dataclass
class Chunk:
    seq: int
    content: str
    start: int
    end: int


def chunk_text(text: str, chunk_size: int = 1000, chunk_overlap: int = 200) -> list[Chunk]:
    """Fixed-size chunker with sentence-boundary snap and overlap.

    text/mod.rs:123-168.  chunk_id is assembled by callers as
    f"{doc_id}_{seq}" (text/mod.rs:143).
    """
    chunks: list[Chunk] = []
    start = 0
    counter = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            boundary = _find_sentence_boundary(text, start, end)
            actual_end = boundary if boundary is not None else end
        else:
            actual_end = end
        content = text[start:actual_end]
        if content.strip():
            chunks.append(Chunk(counter, content, start, actual_end))
            counter += 1
        if actual_end >= n:
            break
        overlap_start = max(actual_end - chunk_overlap, 0)
        start = max(start + 1, overlap_start)
    return chunks


HIERARCHICAL_SEPARATORS = (
    "\n\n", "\n", ". ", "! ", "? ", "; ", ": ", " ", "",
)  # text/chunking.rs:18-28
HIERARCHICAL_MIN_CHUNK = 50  # text/chunking.rs:29


def _find_word_boundary_backward(text: str, pos: int) -> int:
    """text/chunking.rs:131-152: walk back to the nearest whitespace."""
    while pos > 0:
        if text[pos - 1].isspace():
            return pos
        pos -= 1
    return 0


def _find_optimal_boundary(text: str, start: int, max_end: int,
                           separators=HIERARCHICAL_SEPARATORS) -> int:
    """text/chunking.rs:105-127: last occurrence of the highest-priority
    separator inside the window, if past the window's first quarter."""
    search = text[start:max_end]
    for sep in separators:
        if not sep:
            continue
        pos = search.rfind(sep)
        if pos != -1:
            boundary = start + pos + len(sep)
            if boundary > start + (max_end - start) // 4:
                return boundary
    return _find_word_boundary_backward(text, max_end)


def hierarchical_chunk_text(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    min_chunk_size: int = HIERARCHICAL_MIN_CHUNK,
    separators=HIERARCHICAL_SEPARATORS,
) -> list[Chunk]:
    """Hierarchical chunker (T2) — text/chunking.rs:47-103
    (`HierarchicalChunker::chunk_text`), RecursiveCharacterTextSplitter
    style: window end snapped to the best separator by priority, next
    start = end - overlap re-aligned backward to a word boundary.

    Deviations from the Rust (documented): indices are unicode code
    points, not UTF-8 bytes (equivalent for ASCII transcripts); a
    no-forward-progress guard jumps to `end` where the reference could
    loop on pathological separator layouts.
    """
    chunks: list[Chunk] = []
    start = 0
    seq = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        if end >= n:
            content = text[start:]
            if len(content.strip()) >= min_chunk_size:
                chunks.append(Chunk(seq, content, start, n))
            break
        optimal = _find_optimal_boundary(text, start, end, separators)
        if optimal > start:
            end = optimal
        content = text[start:end]
        if len(content.strip()) >= min_chunk_size:
            chunks.append(Chunk(seq, content, start, end))
            seq += 1
        if end >= n:
            break
        next_start = max(end - chunk_overlap, 0)
        next_start = _find_word_boundary_backward(text, next_start)
        if next_start <= start:          # forward-progress guard
            next_start = end
        start = next_start
    return chunks


# ---------------------------------------------------------------------------
# Entity extraction — entity/mod.rs
# ---------------------------------------------------------------------------

PERSON_TITLES = frozenset([
    "mr", "mrs", "ms", "dr", "prof", "professor", "sir", "lady", "lord",
    "captain", "major", "colonel", "general", "admiral", "judge", "father",
    "mother", "brother", "sister", "aunt", "uncle", "grandfather",
    "grandmother",
])  # entity/mod.rs:196-220

NON_PERSON_WORDS = frozenset([
    "chapter", "the", "and", "but", "or", "in", "on", "at", "to", "for",
    "with", "by", "from", "about", "into", "through", "during", "before",
    "after", "above", "below", "up", "down", "out", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when", "where",
    "why", "how", "all", "any", "both", "each", "few", "more", "most",
    "other", "some", "such", "only", "own", "same", "so", "than", "too",
    "very", "can", "will", "just", "should", "now", "temptations",
    "strategic", "movements", "decides", "upon", "whitewashing", "saturday",
    "monday", "tuesday", "wednesday", "thursday", "friday", "sunday",
    "january", "february", "march", "april", "may", "june", "july", "august",
    "september", "october", "november", "december", "adventures", "complete",
])  # entity/mod.rs:223-310

KNOWN_NAMES: tuple[tuple[str, int], ...] = tuple(
    (name, 2) for name in [
        "Entity Name", "Second Entity", "Guardian Entity", "Friend Entity",
        "Companion Entity", "Third Entity", "Fourth Entity", "Fifth Entity",
        "Sixth Entity", "Seventh Entity", "Eighth Entity", "Ninth Entity",
    ]
)  # entity/mod.rs:372-385

NAME_ENDINGS = ("son", "sen", "ton", "ham", "ford", "ley", "ment", "ard", "ert")
NAME_PREFIXES = ("mc", "mac", "o'", "de", "van", "von", "la", "le")
SHORT_NON_NAMES = frozenset([
    "it", "is", "as", "at", "be", "by", "do", "go", "he", "if", "in", "me",
    "my", "no", "of", "on", "or", "so", "to", "up", "us", "we",
])  # entity/mod.rs:689-692

ORG_SUFFIXES = ("Inc", "Corp", "LLC", "Ltd", "Company", "Corporation",
                "Group", "Solutions", "Technologies")  # entity/mod.rs:518-528
ORG_PREFIXES = ("University of", "Institute of", "Department of")  # :529
ORG_INDICATORS = ("Inc", "Corp", "LLC", "Ltd", "Company", "Corporation",
                  "University", "Institute")  # :715-724

KNOWN_LOCATIONS = ("United States", "New York", "California", "London",
                   "Paris", "Tokyo", "Berlin", "Washington", "Boston",
                   "Chicago")  # entity/mod.rs:585-596, :773-784

CONCEPT_INDICATORS = ("Theory", "Concept", "Principle", "Philosophy",
                      "Doctrine", "Idea", "Method", "Approach", "Framework",
                      "Model", "Paradigm", "Thesis")  # :938-951
EVENT_WORDS = ("meeting", "conference", "ceremony", "celebration", "festival",
               "competition", "war", "battle", "expedition", "journey",
               "trial")  # :999-1011
OBJECT_WORDS = ("sword", "shield", "book", "manuscript", "scroll", "tablet",
                "ring", "crown", "treasure", "coin", "tool",
                "weapon")  # :1036-1049

COMMON_WORDS = frozenset(w.lower() for w in [
    "the", "and", "but", "or", "in", "on", "at", "to", "for", "with", "by",
    "from", "about", "into", "through", "during", "before", "after", "above",
    "below", "up", "down", "out", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some", "such",
    "only", "own", "same", "so", "than", "too", "very", "can", "will",
    "just", "should", "now", "could", "would", "said", "says", "told",
    "asked", "went", "came", "come", "going", "chapter", "page", "section",
    "part", "book", "volume",
])  # entity/mod.rs:1135-1144 (matched case-insensitively, :1146-1148)

CODE_PATTERNS: dict[str, str] = {  # entity/mod.rs:140-169
    "FUNCTION": r"(?:pub\s+)?(?:async\s+)?fn\s+([a-z_][a-z0-9_]*)",
    "STRUCT": r"(?:pub\s+)?struct\s+([A-Z][a-zA-Z0-9]*)",
    "ENUM": r"(?:pub\s+)?enum\s+([A-Z][a-zA-Z0-9]*)",
    "TRAIT": r"(?:pub\s+)?trait\s+([A-Z][a-zA-Z0-9]*)",
    "IMPL": r"impl(?:<[^>]+>)?\s+([A-Z][a-zA-Z0-9]*)",
    "MODULE": r"(?:pub\s+)?mod\s+([a-z_][a-z0-9_]*)",
    "CRATE": r"use\s+([a-z_][a-z0-9_]*)::",
    "TYPE": r"(?:pub\s+)?type\s+([A-Z][a-zA-Z0-9]*)\s*(?:<[^>]+>)?\s*=",
    "CONST": r"(?:pub\s+)?const\s+([A-Z_][A-Z0-9_]*)\s*:",
    "MACRO": r"macro_rules!\s+([a-z_][a-z0-9_]*)",
}


@dataclass
class Mention:
    start: int
    end: int
    confidence: float


@dataclass
class ExtractedEntity:
    entity_id: str
    name: str
    entity_type: str
    confidence: float
    mentions: list[Mention] = field(default_factory=list)


_NON_WORD_ASCII = re.compile(r"[^A-Za-z']+")


@lru_cache(maxsize=1 << 16)
def _clean_word(word: str) -> str:
    """entity/mod.rs:653-659 — keep alphabetic + apostrophes, strip trailing '.

    ASCII fast path: one compiled-regex sub instead of a per-char genexpr
    (this function dominates extraction CPU; `str.isascii` is O(n) in C and
    `[A-Za-z]` == `str.isalpha` exactly on ASCII input).  Non-ASCII words
    fall back to the Unicode-faithful per-char loop.

    lru_cache is safe (pure function of the word) and pays because word
    frequency is Zipf-distributed — the bounded 64k-entry cache catches
    the bulk of calls at any corpus size without unbounded growth.
    """
    if word.isascii():
        return _NON_WORD_ASCII.sub("", word).rstrip("'")
    kept = "".join(c for c in word if c.isalpha() or c == "'")
    return kept.rstrip("'")


def _is_capitalized(word: str) -> bool:
    return bool(word) and word[0].isupper()


@lru_cache(maxsize=1 << 16)
def _is_likely_person_word(word: str) -> bool:
    """entity/mod.rs:662-699.  Pure per-word predicate → cached (same
    rationale as `_clean_word`)."""
    if len(word) < 2:
        return False
    wl = word.lower()
    has_ending = any(wl.endswith(e) for e in NAME_ENDINGS)
    has_prefix = any(wl.startswith(p) for p in NAME_PREFIXES)
    is_proper = word[0].isupper() and all(c.isalpha() or c == "'" for c in word)
    if len(word) <= 2 and wl in SHORT_NON_NAMES:
        return False
    return is_proper and (len(word) >= 3 or has_ending or has_prefix)


def _is_likely_person_name(name: str) -> bool:
    """entity/mod.rs:708-711 — exactly two capitalized parts."""
    parts = name.split()
    return len(parts) == 2 and all(_is_capitalized(p) for p in parts)


def _is_likely_organization(name: str) -> bool:
    return any(ind in name for ind in ORG_INDICATORS)


def _is_known_location(name: str) -> bool:
    return any(loc in name for loc in KNOWN_LOCATIONS)


def _is_common_word(word: str) -> bool:
    return word.lower() in COMMON_WORDS


@lru_cache(maxsize=1 << 16)
def calculate_confidence(name: str, entity_type: str) -> float:
    """entity/mod.rs:731-769.  Pure in (name, type) → cached."""
    confidence = 0.5
    if entity_type == "PERSON":
        if "Dr." in name or "Prof." in name:
            confidence += 0.3
        if len(name.split()) == 2:
            confidence += 0.2
    elif entity_type == "ORGANIZATION":
        if "Inc" in name or "Corp" in name or "LLC" in name:
            confidence += 0.3
        if "University" in name or "Institute" in name:
            confidence += 0.2
    elif entity_type == "LOCATION":
        if "," in name:
            confidence += 0.2
        if _is_known_location(name):
            confidence += 0.3
    if name and name[0].isupper():
        confidence += 0.1
    return min(confidence, 1.0)


@lru_cache(maxsize=1 << 16)
def normalize_entity_name(name: str) -> str:
    """entity/mod.rs:789-795 — entity-id normalization.  Pure → cached.

    NOTE the reference filters out spaces *before* the space→underscore
    replace, so "John Smith" → "johnsmith" (not "john_smith").  We keep
    that behavior bit-for-bit: ids only need to be stable, not pretty.
    """
    kept = "".join(c for c in name.lower() if c.isalnum() or c == "_")
    return kept.replace(" ", "_")


def make_entity_id(name: str, entity_type: str) -> str:
    """entity/mod.rs:625."""
    return f"{entity_type}_{normalize_entity_name(name)}"


def find_mentions(text: str, name: str, confidence: float) -> list[Mention]:
    """entity/mod.rs:627-639 — all non-overlapping occurrences, left to right."""
    mentions: list[Mention] = []
    start = 0
    while True:
        pos = text.find(name, start)
        if pos == -1:
            break
        mentions.append(Mention(pos, pos + len(name), confidence))
        start = pos + len(name)
    return mentions


def _mk(name: str, entity_type: str, confidence: float, text: str) -> ExtractedEntity:
    return ExtractedEntity(
        entity_id=make_entity_id(name, entity_type),
        name=name,
        entity_type=entity_type,
        confidence=confidence,
        mentions=find_mentions(text, name, confidence),
    )


# KNOWN_NAMES indexed by lowercase first word.  A candidate at position i
# can only match names whose first word equals cleaned-lowered words[i], so
# the per-position scan shrinks from O(|KNOWN_NAMES|) to one dict lookup.
# Within a bucket the original KNOWN_NAMES order is preserved, so the
# first-match `break` picks the same winner as the reference's linear scan.
_KNOWN_BY_FIRST: dict[str, list[tuple[str, list[str], int]]] = {}
for _name, _wc in KNOWN_NAMES:
    _nw = [w.lower() for w in _name.split()]
    _KNOWN_BY_FIRST.setdefault(_nw[0], []).append((_name, _nw, _wc))
del _name, _wc, _nw


def _extract_persons(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:190-513 — four ordered phases over whitespace tokens.

    Perf note: `_clean_word`/lowercase are pure, so each word is cleaned
    exactly once up front and all four phases index the precomputed arrays
    — the phase logic below is otherwise a line-for-line match of the
    reference's ordered scans.
    """
    entities: list[ExtractedEntity] = []
    words = text.split()
    n = len(words)
    cleaned = [_clean_word(w) for w in words]
    lowered = [c.lower() for c in cleaned]
    processed: set[int] = set()

    # PHASE 1: known multi-word names (entity/mod.rs:364-421)
    for i in range(n):
        if i in processed:
            continue
        for name, name_words, word_count in _KNOWN_BY_FIRST.get(lowered[i], ()):
            if i + len(name_words) <= n and all(
                lowered[i + j] == expected
                for j, expected in enumerate(name_words)
            ):
                if 0.95 >= min_confidence:
                    entities.append(_mk(name, "PERSON", 0.95, text))
                for j in range(word_count):
                    processed.add(i + j)
                break

    # PHASE 2: title-based names (entity/mod.rs:424-471)
    for i in range(n):
        if i in processed:
            continue
        if (lowered[i] in PERSON_TITLES
                and i + 1 < n and (i + 1) not in processed):
            next_word = cleaned[i + 1]
            if _is_capitalized(words[i + 1]) and _is_likely_person_word(next_word):
                if i + 2 < n and (i + 2) not in processed:
                    third = cleaned[i + 2]
                    if _is_capitalized(words[i + 2]) and _is_likely_person_word(third):
                        processed.add(i + 2)
                        name = f"{next_word} {third}"
                    else:
                        name = next_word
                else:
                    name = next_word
                if 0.9 >= min_confidence:
                    entities.append(_mk(name, "PERSON", 0.9, text))
                processed.add(i)
                processed.add(i + 1)

    # PHASE 3: two-word First Last (entity/mod.rs:474-513)
    for i in range(n):
        if i in processed or i + 1 >= n or (i + 1) in processed:
            continue
        first = cleaned[i]
        second = cleaned[i + 1]
        if (_is_capitalized(words[i]) and _is_capitalized(words[i + 1])
                and _is_likely_person_word(first) and _is_likely_person_word(second)
                and lowered[i] not in NON_PERSON_WORDS
                and lowered[i + 1] not in NON_PERSON_WORDS):
            name = f"{first} {second}"
            if _is_likely_person_name(name):
                confidence = calculate_confidence(name, "PERSON")
                if confidence >= min_confidence:
                    entities.append(_mk(name, "PERSON", confidence, text))
                processed.add(i)
                processed.add(i + 1)

    # PHASE 4: single capitalized words (entity/mod.rs:339-358)
    for i, raw in enumerate(words):
        if i in processed:
            continue
        word = cleaned[i]
        if len(word) < 2 or lowered[i] in NON_PERSON_WORDS:
            continue
        if _is_capitalized(raw) and _is_likely_person_word(word):
            confidence = calculate_confidence(word, "PERSON")
            if confidence >= min_confidence:
                entities.append(_mk(word, "PERSON", confidence, text))

    return entities


def _extract_organizations(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:516-580 — first occurrence per suffix/prefix."""
    entities: list[ExtractedEntity] = []
    for suffix in ORG_SUFFIXES:
        pos = text.find(suffix)
        if pos != -1:
            sp = text.rfind(" ", 0, pos)
            start = sp + 1 if sp != -1 else 0
            name = text[start:pos + len(suffix)].strip()
            if name and _is_likely_organization(name):
                confidence = calculate_confidence(name, "ORGANIZATION")
                if confidence >= min_confidence:
                    entities.append(_mk(name, "ORGANIZATION", confidence, text))
    for prefix in ORG_PREFIXES:
        pos = text.find(prefix)
        if pos != -1:
            dot = text.find(".", pos)
            end = dot if dot != -1 else min(len(text), pos + 50)
            name = text[pos:end].strip()
            if name and len(name) > len(prefix):
                confidence = calculate_confidence(name, "ORGANIZATION")
                if confidence >= min_confidence:
                    entities.append(_mk(name, "ORGANIZATION", confidence, text))
    return entities


def _extract_locations(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:583-614 — known-locations contains scan."""
    entities = []
    for location in KNOWN_LOCATIONS:
        if location in text:
            confidence = calculate_confidence(location, "LOCATION")
            if confidence >= min_confidence:
                entities.append(_mk(location, "LOCATION", confidence, text))
    return entities


@lru_cache(maxsize=1 << 16)
def _has_concept_indicator(clean: str) -> bool:
    """Pure per-word substring scan over CONCEPT_INDICATORS → cached;
    the genexpr was the single hottest line of `_extract_concepts`."""
    return any(ind in clean for ind in CONCEPT_INDICATORS)


def _extract_concepts(text: str, entity_type: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:928-992."""
    entities = []
    for word in text.split():
        clean = _clean_word(word)
        if _has_concept_indicator(clean):
            if 0.75 >= min_confidence:
                entities.append(_mk(clean, entity_type, 0.75, text))
        if _is_capitalized(word) and len(word) > 4:
            clean2 = _clean_word(word)
            if not _is_common_word(clean2):
                if 0.6 >= min_confidence:
                    entities.append(_mk(clean2, entity_type, 0.6, text))
    return entities


def _extract_events(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:995-1029."""
    lower = text.lower()
    return [
        _mk(w, "EVENT", 0.7, text)
        for w in EVENT_WORDS
        if w in lower and 0.7 >= min_confidence
    ]


def _extract_objects(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:1032-1067."""
    lower = text.lower()
    return [
        _mk(w, "OBJECT", 0.65, text)
        for w in OBJECT_WORDS
        if w in lower and 0.65 >= min_confidence
    ]


def _extract_code_entities(text: str, entity_type: str, pattern: str,
                           min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:1071-1100 — regex captures, confidence 0.95."""
    entities = []
    for m in re.finditer(pattern, text):
        name = m.group(1)
        if len(name) >= 2 and 0.95 >= min_confidence:
            entities.append(_mk(name, entity_type, 0.95, text))
    return entities


def _extract_generic(text: str, entity_type: str, min_confidence: float) -> list[ExtractedEntity]:
    """entity/mod.rs:1102-1131 — capitalized words > 3 chars, confidence 0.5."""
    entities = []
    for word in text.split():
        if _is_capitalized(word) and len(word) > 3:
            clean = _clean_word(word)
            if not _is_common_word(clean) and 0.5 >= min_confidence:
                entities.append(_mk(clean, entity_type, 0.5, text))
    return entities


_PERSON_TYPES = {"PERSON", "CHARACTER", "RESEARCHER", "SPEAKER", "DIALOGUE_SPEAKER"}
_ORG_TYPES = {"ORGANIZATION", "INSTITUTION", "BRAND", "COMPANY"}
_LOC_TYPES = {"LOCATION", "SETTING", "PLACE"}
_CONCEPT_TYPES = {"CONCEPT", "THEORY", "THEME", "ARGUMENT", "IDEA"}
_EVENT_TYPES = {"EVENT", "EXPERIMENT", "HAPPENING"}
_OBJECT_TYPES = {"OBJECT", "TOOL", "ARTIFACT", "ITEM"}


def extract_from_chunk(
    text: str,
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
    min_confidence: float = 0.7,
    allowed_patterns: tuple[str, ...] = (),
    excluded_patterns: tuple[str, ...] = (),
) -> list[ExtractedEntity]:
    """entity/mod.rs:97-187 — type dispatch, filtering, per-chunk dedup.

    Output order is determinized (see module docstring): entities sorted by
    (first mention offset, entity_id); this fixes downstream triple
    orientation, where the Rust original inherits HashMap iteration order.
    """
    entities: list[ExtractedEntity] = []
    for entity_type in entity_types:
        if entity_type in _PERSON_TYPES:
            entities.extend(_extract_persons(text, min_confidence))
        elif entity_type in _ORG_TYPES:
            entities.extend(_extract_organizations(text, min_confidence))
        elif entity_type in _LOC_TYPES:
            entities.extend(_extract_locations(text, min_confidence))
        elif entity_type in _CONCEPT_TYPES:
            entities.extend(_extract_concepts(text, entity_type, min_confidence))
        elif entity_type in _EVENT_TYPES:
            entities.extend(_extract_events(text, min_confidence))
        elif entity_type in _OBJECT_TYPES:
            entities.extend(_extract_objects(text, min_confidence))
        elif entity_type in CODE_PATTERNS:
            entities.extend(_extract_code_entities(
                text, entity_type, CODE_PATTERNS[entity_type], min_confidence))
        else:
            entities.extend(_extract_generic(text, entity_type, min_confidence))

    # Pattern filtering (entity/mod.rs:892-925)
    if allowed_patterns:
        allow = [re.compile(p) for p in allowed_patterns]
        entities = [e for e in entities if any(r.search(e.name) for r in allow)]
    if excluded_patterns:
        deny = [re.compile(p) for p in excluded_patterns]
        entities = [e for e in entities if not any(r.search(e.name) for r in deny)]

    # Per-chunk dedup by (name, type): merge mentions, max confidence
    # (entity/mod.rs:798-819)
    unique: dict[tuple[str, str], ExtractedEntity] = {}
    for e in entities:
        key = (e.name, e.entity_type)
        if key in unique:
            unique[key].mentions.extend(e.mentions)
            if e.confidence > unique[key].confidence:
                unique[key].confidence = e.confidence
        else:
            unique[key] = e

    out = [e for e in unique.values() if e.confidence >= min_confidence]
    # Determinization (divergence #2): sort by first mention offset, then id.
    out.sort(key=lambda e: (min((m.start for m in e.mentions), default=1 << 60),
                            e.entity_id))
    return out


# ---------------------------------------------------------------------------
# Relationship typing + pairwise co-occurrence — entity/mod.rs:822-889
# ---------------------------------------------------------------------------

def infer_relationship_type(type1: str, type2: str, context: str) -> str:
    """entity/mod.rs:851-889 — rule table on (type1,type2) × context keywords."""
    pair = (type1, type2)
    if pair in (("PERSON", "ORGANIZATION"), ("ORGANIZATION", "PERSON")):
        if "works for" in context or "employed by" in context:
            return "WORKS_FOR"
        if "founded" in context or "CEO" in context:
            return "LEADS"
        return "ASSOCIATED_WITH"
    if pair in (("PERSON", "LOCATION"), ("LOCATION", "PERSON")):
        if "born in" in context or "from" in context:
            return "BORN_IN"
        if "lives in" in context or "based in" in context:
            return "LOCATED_IN"
        return "ASSOCIATED_WITH"
    if pair in (("ORGANIZATION", "LOCATION"), ("LOCATION", "ORGANIZATION")):
        if "headquartered" in context or "based in" in context:
            return "HEADQUARTERED_IN"
        return "LOCATED_IN"
    if pair == ("PERSON", "PERSON"):
        if "married" in context or "spouse" in context:
            return "MARRIED_TO"
        if "colleague" in context or "partner" in context:
            return "COLLEAGUE_OF"
        return "KNOWS"
    return "RELATED_TO"


def extract_chunk_triples(
    entities: list[ExtractedEntity], chunk_text_content: str
) -> list[tuple[str, str, str]]:
    """Unordered i<j pairs over the chunk's deterministic entity order.

    entity/mod.rs:822-848 (pair loop) driven per chunk from lib.rs:543-587.
    `entities` must already be in extract_from_chunk's deterministic order.
    """
    triples = []
    for i in range(len(entities)):
        for j in range(i + 1, len(entities)):
            e1, e2 = entities[i], entities[j]
            pred = infer_relationship_type(e1.entity_type, e2.entity_type,
                                           chunk_text_content)
            triples.append((e1.entity_id, pred, e2.entity_id))
    return triples


# ---------------------------------------------------------------------------
# String similarity — entity/string_similarity_linker.rs:130-409
# ---------------------------------------------------------------------------

def normalize_string(s: str, case_insensitive: bool = True,
                     remove_punctuation: bool = True) -> str:
    """string_similarity_linker.rs:171-190."""
    if case_insensitive:
        s = s.lower()
    if remove_punctuation:
        s = "".join(c for c in s if c.isalnum() or c.isspace())
    return " ".join(s.split())


def levenshtein_distance(s1: str, s2: str) -> int:
    """string_similarity_linker.rs:209-249 — classic DP, O(len1*len2)."""
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i] + [0] * len(s2)
        for j, c2 in enumerate(s2, 1):
            cost = 0 if c1 == c2 else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[len(s2)]


def _levenshtein_bounded(s1: str, s2: str, k: int) -> int:
    """Exact distance when ≤ k, else any value > k (Ukkonen band DP).

    Cells outside the |i-j| ≤ k band are capped at k+1; a capped value can
    only ever propagate to values > k, so any reported value ≤ k is exact.
    Rows whose whole band exceeds k abort early (every path crosses each
    row's band).  O(k·min(len1,len2)) instead of O(len1·len2).
    """
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return len2
    if len2 == 0:
        return len1
    if abs(len1 - len2) > k:
        return k + 1
    big = k + 1
    prev = [j if j <= k else big for j in range(len2 + 1)]
    for i in range(1, len1 + 1):
        c1 = s1[i - 1]
        lo = i - k if i - k > 1 else 1
        hi = i + k if i + k < len2 else len2
        cur = [big] * (len2 + 1)
        cur[0] = i if i <= k else big
        row_min = cur[0]
        for j in range(lo, hi + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            v = prev[j - 1] + cost
            v2 = prev[j] + 1
            if v2 < v:
                v = v2
            v3 = cur[j - 1] + 1
            if v3 < v:
                v = v3
            if v > big:
                v = big
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min > k:
            return big
        prev = cur
    return prev[len2]


def levenshtein_similarity(s1: str, s2: str, max_edit_distance: int = 2) -> float:
    """string_similarity_linker.rs:193-206.

    Uses the banded bounded distance: the reference maps any distance
    above `max_edit_distance` to 0.0, so only distances ≤ the cutoff need
    to be exact — which the band guarantees.
    """
    d = _levenshtein_bounded(s1, s2, max_edit_distance)
    if d > max_edit_distance:
        return 0.0
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - d / max_len


def jaro_similarity(s1: str, s2: str) -> float:
    """string_similarity_linker.rs:267-326."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    match_distance = max(max(len1, len2) // 2 - 1, 0)
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i in range(len1):
        start = max(i - match_distance, 0)
        end = min(i + match_distance + 1, len2)
        for j in range(start, end):
            if s2_matches[j] or s1[i] != s2[j]:
                continue
            s1_matches[i] = True
            s2_matches[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not s1_matches[i]:
            continue
        while not s2_matches[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0


def jaro_winkler_similarity(s1: str, s2: str) -> float:
    """string_similarity_linker.rs:252-264 — prefix bonus up to 4 chars."""
    jaro = jaro_similarity(s1, s2)
    prefix_len = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix_len += 1
    return jaro + prefix_len * 0.1 * (1.0 - jaro)


def jaccard_similarity(s1: str, s2: str) -> float:
    """string_similarity_linker.rs:329-345 — whitespace-token Jaccard."""
    t1, t2 = set(s1.split()), set(s2.split())
    if not t1 and not t2:
        return 1.0
    union = len(t1 | t2)
    if union == 0:
        return 0.0
    return len(t1 & t2) / union


_SOUNDEX_CODES = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(s: str) -> str:
    """string_similarity_linker.rs:360-396 — simplified Soundex, 4 chars."""
    if not s:
        return ""
    chars = s.upper()
    result = chars[0] if chars[0].isalpha() else ""
    prev_code = _SOUNDEX_CODES.get(chars[0], "0")
    for c in chars[1:]:
        code = _SOUNDEX_CODES.get(c, "0")
        if code != "0" and code != prev_code:
            result += code
            prev_code = code
        if len(result) >= 4:
            break
    return result.ljust(4, "0")


def compute_similarity(
    name1: str, name2: str,
    same_type: bool = True,
    fuzzy_matching: bool = True,
    use_phonetic: bool = False,
    max_edit_distance: int = 2,
) -> float:
    """string_similarity_linker.rs:130-168 — max over the metric family.

    Callers pass already-raw names; normalization happens here.  Entities of
    different types never link (:132-134).
    """
    if not same_type:
        return 0.0
    n1 = normalize_string(name1)
    n2 = normalize_string(name2)
    if n1 == n2:
        return 1.0
    scores = []
    if fuzzy_matching:
        scores.append(levenshtein_similarity(n1, n2, max_edit_distance))
    scores.append(jaro_winkler_similarity(n1, n2))
    scores.append(jaccard_similarity(n1, n2))
    if use_phonetic:
        scores.append(0.9 if soundex(n1) == soundex(n2) else 0.0)
    return max(scores) if scores else 0.0


def split_sentences(text: str) -> list[str]:
    """Transliteration of SemanticChunker::split_sentences
    (text/semantic_chunking.rs:137-176): line-wise, blank lines flush,
    split_inclusive on .!? with trimmed parts joined by single spaces."""
    sentences: list[str] = []
    current = ""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if current:
                sentences.append(current.strip())
                current = ""
            continue
        parts, buf = [], ""
        for ch in line:
            buf += ch
            if ch in ".!?":
                parts.append(buf)
                buf = ""
        if buf:
            parts.append(buf)
        for part in parts:
            part = part.strip()
            if not part:
                continue
            current += part + " "
            if part.endswith((".", "!", "?")):
                sentences.append(current.strip())
                current = ""
    if current.strip():
        sentences.append(current.strip())
    return sentences


def create_semantic_chunks(
    sentences: list[str],
    breakpoints: list[int],
    min_chunk_size: int = 1,
    max_chunk_size: int = 0,
) -> list[tuple[str, int, int]]:
    """Transliteration of SemanticChunker::create_chunks
    (text/semantic_chunking.rs:268-318) → [(content, start, end)].

    Faithful quirks: a segment below min_chunk_size is skipped WITHOUT
    advancing start (it merges into the following segment); oversize
    segments split into max_chunk_size pieces.
    """
    chunks: list[tuple[str, int, int]] = []
    start = 0
    for end in [*breakpoints, len(sentences)]:
        if end <= start:
            continue
        count = end - start
        if count < min_chunk_size:
            continue
        if 0 < max_chunk_size < count:
            sub = start
            while sub < end:
                sub_end = min(sub + max_chunk_size, end)
                chunks.append((" ".join(sentences[sub:sub_end]),
                               sub, sub_end))
                sub = sub_end
        else:
            chunks.append((" ".join(sentences[start:end]), start, end))
        start = end
    return chunks

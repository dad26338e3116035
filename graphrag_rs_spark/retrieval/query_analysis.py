"""Q4 — query analysis (reference retrieval/mod.rs:600-684).

Single-query, driver-side logic (one string in, one analysis out) — a
faithful Python transliteration, NOT a DataFrame job: the reference runs
this once per user query before retrieval, and so do we (the downstream
retrievers — BM25/dual/fusion — are the distributed part).

`analyze_query(query, entity_names)` reproduces:
  - key-entity detection: bidirectional substring match between query
    words and entity names (:605-615)
  - concept extraction: words > 3 chars, non-stopword, not covered by a
    detected entity (:617-627)
  - QueryType rule chain (:629-640): Relationship (≥2 entities) →
    EntityFocused (1) → Conceptual (abstract indicator) → Exploratory
    (question word) → Factual
  - QueryIntent keyword tables (:642-670): Overview / Detailed /
    Comparative / Causal / Temporal, default Detailed
  - complexity score = min(0.1·|words| + 0.3·|entities| + 0.2·|concepts|, 1)
    (:672-676)
"""

from __future__ import annotations

from dataclasses import dataclass, field

# retrieval/mod.rs:1411-1417
STOP_WORDS = frozenset(
    "the be to of and a in that have i it for not on with he as you do at "
    "this but his by from they we say her she or an will my one all would "
    "there their what so up out if about who get which go me".split())

# retrieval/mod.rs:1291-1304
ABSTRACT_INDICATORS = frozenset(
    "concept idea theory principle philosophy meaning understanding "
    "knowledge wisdom truth beauty justice".split())

# retrieval/mod.rs:1312-1314
QUESTION_WORDS = frozenset(
    "what how why when where who which explain describe".split())

_INTENT_TABLE = [
    ("Overview", {"overview", "summary", "general", "about"}),
    ("Detailed", {"detailed", "specific", "exactly", "precise"}),
    ("Comparative", {"compare", "vs", "versus", "between", "difference"}),
    ("Causal", {"cause", "why", "because", "lead", "result"}),
    ("Temporal", {"when", "time", "before", "after", "during"}),
]


@dataclass
class QueryAnalysis:
    query_type: str
    intent: str
    key_entities: list[str] = field(default_factory=list)
    concepts: list[str] = field(default_factory=list)
    complexity_score: float = 0.0


def analyze_query(query: str, entity_names: list[str]) -> QueryAnalysis:
    words = query.lower().split()

    key_entities = []
    for name in entity_names:
        low = name.lower()
        if any(low in w or w in low for w in words):
            key_entities.append(name)

    lowered = [e.lower() for e in key_entities]
    concepts = [
        w for w in words
        if len(w) > 3 and w not in STOP_WORDS
        and not any(w in e or e in w for e in lowered)
    ]

    if len(key_entities) > 1:
        query_type = "Relationship"
    elif key_entities:
        query_type = "EntityFocused"
    elif any(w in ABSTRACT_INDICATORS for w in words):
        query_type = "Conceptual"
    elif any(w in QUESTION_WORDS for w in words):
        query_type = "Exploratory"
    else:
        query_type = "Factual"

    intent = "Detailed"
    for name, kws in _INTENT_TABLE:
        if any(w in kws for w in words):
            intent = name
            break

    complexity = min(
        len(words) * 0.1 + len(key_entities) * 0.3 + len(concepts) * 0.2,
        1.0)
    return QueryAnalysis(query_type=query_type, intent=intent,
                         key_entities=key_entities, concepts=concepts,
                         complexity_score=round(complexity, 6))

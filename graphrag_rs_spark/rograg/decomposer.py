"""Q13 — ROGRAG syntactic query decomposition (rograg/decomposer.rs:468-638).

Driver-side by design (one query string in, subqueries out) — faithful
transliteration of the SyntacticQueryDecomposer: clause boundaries at
conjunction/punctuation separators, leading-separator strip, >3-char
clause filter, rule-table clause typing, priority = 1 − 0.1·idx,
confidence 0.7 when decomposed / single-query passthrough otherwise.

The semantic decomposer (decomposer.rs:291-466) is regex-pattern-driven
around an LLM seam; the syntactic strategy is the reference's fallback
and the deterministic core — the hybrid wrapper tries semantic first and
falls back (decomposer.rs:638-714), so syntactic-only is the no-LLM
behavior, same as our gleaning fake posture.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# decomposer.rs:488-499
CLAUSE_SEPARATORS = ["and", "or", "but", ",", ";", "also",
                     "furthermore", "moreover", "however", "therefore"]


@dataclass
class Subquery:
    id: str
    text: str
    query_type: str
    priority: float


@dataclass
class DecompositionResult:
    original_query: str
    subqueries: list[Subquery] = field(default_factory=list)
    strategy_used: str = "Syntactic"
    confidence: float = 0.3

    @property
    def is_decomposed(self) -> bool:
        return len(self.subqueries) > 1


def _boundaries(query: str) -> list[int]:
    """decomposer.rs:503-524 — every separator occurrence is a boundary."""
    bounds = {0, len(query)}
    low = query.lower()
    for sep in CLAUSE_SEPARATORS:
        start = 0
        while (pos := low.find(sep, start)) != -1:
            bounds.add(pos)
            start = pos + len(sep)
    return sorted(bounds)


def extract_clauses(query: str) -> list[str]:
    """decomposer.rs:526-552."""
    bounds = _boundaries(query)
    clauses = []
    for start, end in zip(bounds, bounds[1:]):
        clause = query[start:end].strip()
        for sep in CLAUSE_SEPARATORS:
            if clause.lower().startswith(sep.lower()):
                clause = clause[len(sep):].strip()
        if clause and len(clause) > 3:
            clauses.append(clause)
    return clauses


def classify_clause_type(clause: str) -> str:
    """decomposer.rs:554-573 rule table."""
    c = clause.lower()
    if c.startswith("who") or c.startswith("what person"):
        return "Entity"
    if c.startswith("what"):
        return "Definitional"
    if c.startswith("when"):
        return "Temporal"
    if c.startswith("why") or "because" in c:
        return "Causal"
    if "relation" in c or "connect" in c:
        return "Relationship"
    if "compare" in c or "versus" in c:
        return "Comparative"
    return "Attribute"


def can_decompose(query: str) -> bool:
    low = query.lower()
    return any(sep in low for sep in CLAUSE_SEPARATORS)


def decompose(query: str) -> DecompositionResult:
    """decomposer.rs:585-622."""
    clauses = extract_clauses(query)
    if len(clauses) <= 1:
        # DecompositionResult::single_query (decomposer.rs:716-729):
        # id "single", type Entity, confidence 1.0 — the original query
        # is preserved intact, so the result is fully confident
        return DecompositionResult(original_query=query, subqueries=[
            Subquery(id="single", text=query,
                     query_type="Entity", priority=1.0)],
            confidence=1.0)
    subqueries = [
        Subquery(id=f"syn_{i}", text=c, query_type=classify_clause_type(c),
                 priority=round(1.0 - i * 0.1, 6))
        for i, c in enumerate(clauses)
    ]
    return DecompositionResult(original_query=query, subqueries=subqueries,
                               confidence=0.7)

"""Implicit-relationship inference (operators/inference.py) vs a pure-
Python transliteration of reference inference.rs:83-413."""

from __future__ import annotations

import math
import random

from graphrag_rs_spark.operators.inference import (
    FAMILY_PATTERNS,
    FRIENDSHIP_PATTERNS,
    NEGATIVE_PATTERNS,
    infer_relationships,
)


# --- pure-Python transliteration (inference.rs), independent of the
# Spark implementation: driver-side loops, f64 like the Spark side.

def _name_of(eid: str) -> str:
    if "_" in eid:
        return eid[eid.index("_") + 1:].replace("_", " ").lower()
    return eid.lower()


def _proximity(content: str, na: str, nb: str) -> float:
    words = content.split()
    pa = [i for i, w in enumerate(words) if na in w.lower()]
    pb = [i for i, w in enumerate(words) if nb in w.lower()]
    if not pa or not pb:
        return 0.0
    d = min(abs(a - b) for a in pa for b in pb)
    if d <= 2:
        return 0.4
    if d <= 5:
        return 0.3
    if d <= 10:
        return 0.2
    if d <= 20:
        return 0.1
    return 0.05


def _near(content: str, na: str, nb: str, pat: str) -> bool:
    pos = content.find(pat)
    if pos == -1:
        return False
    ctx = content[max(pos - 100, 0):min(pos + len(pat) + 100, len(content))]
    return na in ctx and nb in ctx


def _evidence(content: str, ea: str, eb: str) -> float:
    content = content.lower()
    na, nb = _name_of(ea), _name_of(eb)
    score = 0.2
    score += _proximity(content, na, nb)
    for pat, w in FRIENDSHIP_PATTERNS:
        if pat in content:
            score += w * (0.5 if _near(content, na, nb, pat) else 0.3)
    for pat, w in NEGATIVE_PATTERNS:
        if pat in content:
            score += w * (1.2 if _near(content, na, nb, pat) else 0.8)
    if any(p in content for p in FAMILY_PATTERNS):
        score *= 0.8
    return min(max(score, 0.0), 1.0)


def _infer_py(chunks, chunk_ents, target, min_conf=0.3, max_cand=10):
    tchunks = [cid for cid, ents in chunk_ents.items() if target in ents]
    scores: dict[str, float] = {}
    for cid in tchunks:
        for eid in chunk_ents[cid]:
            if eid != target:
                scores[eid] = scores.get(eid, 0.0) + _evidence(
                    chunks[cid], target, eid)
    out = []
    for eid, s in scores.items():
        conf = round(min(s / len(tchunks), 1.0), 6)
        if conf >= min_conf:
            out.append((eid, conf, len(tchunks)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:max_cand]


_WORDS = ["alice", "bob", "market", "plan", "river", "stone", "best",
          "friend", "together", "enemy", "battle", "brother", "shared",
          "loyal", "companion", "journey", "against", "close", "bond",
          "misc", "green", "hollow"]


def _fixture(seed: int, n_chunks: int = 40):
    rng = random.Random(seed)
    ents = ["PERSON_alice", "PERSON_bob", "LOCATION_river",
            "CONCEPT_plan", "ORGANIZATION_stone"]
    chunks, chunk_ents = {}, {}
    for i in range(n_chunks):
        cid = f"c{i}"
        chunks[cid] = " ".join(rng.choice(_WORDS)
                               for _ in range(rng.randint(8, 40)))
        k = rng.randint(1, 4)
        chunk_ents[cid] = sorted(rng.sample(ents, k))
    return chunks, chunk_ents, ents


def test_infer_matches_transliteration(spark):
    chunks, chunk_ents, ents = _fixture(7)
    cdf = spark.createDataFrame(list(chunks.items()),
                                "chunk_id string, content string")
    cedf = spark.createDataFrame(
        [(cid, e) for cid, es in chunk_ents.items() for e in es],
        "chunk_id string, entity_id string")
    targets = ["PERSON_alice", "ORGANIZATION_stone"]
    got = {
        (r.target_id, r.other_id): (r.confidence, r.evidence_count)
        for r in infer_relationships(cdf, cedf, targets).collect()
    }
    want = {}
    for t in targets:
        for eid, conf, ec in _infer_py(chunks, chunk_ents, t):
            want[(t, eid)] = (conf, ec)
    assert set(got) == set(want)
    for k, (conf, ec) in want.items():
        assert got[k][1] == ec, k
        assert math.isclose(got[k][0], conf, abs_tol=1e-9), (k, got[k], conf)


def test_infer_missing_target_empty(spark):
    chunks, chunk_ents, _ = _fixture(11, n_chunks=6)
    cdf = spark.createDataFrame(list(chunks.items()),
                                "chunk_id string, content string")
    cedf = spark.createDataFrame(
        [(cid, e) for cid, es in chunk_ents.items() for e in es],
        "chunk_id string, entity_id string")
    assert infer_relationships(cdf, cedf, ["PERSON_nobody"]).count() == 0


def test_infer_truncates_to_max_candidates(spark):
    # one target co-occurring with 15 others in EVERY chunk, so each
    # candidate's normalized score clears min_confidence and the
    # max_candidates truncation has to bite
    chunks = {f"c{i}": "alice and e best friends together always here"
              for i in range(30)}
    others = [f"PERSON_x{i:02d}" for i in range(15)]
    chunk_ents = {f"c{i}": ["PERSON_alice"] + others for i in range(30)}
    cdf = spark.createDataFrame(list(chunks.items()),
                                "chunk_id string, content string")
    cedf = spark.createDataFrame(
        [(cid, e) for cid, es in chunk_ents.items() for e in es],
        "chunk_id string, entity_id string")
    rows = infer_relationships(cdf, cedf, ["PERSON_alice"],
                               max_candidates=10).collect()
    assert len(rows) == 10
    # deterministic tie-break: lowest other_id wins among equal scores
    assert [r.other_id for r in rows] == [f"PERSON_x{i:02d}"
                                          for i in range(10)]

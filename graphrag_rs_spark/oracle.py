"""Offline oracle: the reference indexing pipeline run in one process.

Consumes transcript rows (conv_id, turn_idx, text), produces the golden
tables of FIXTURES.md §4 using `reference_logic` (the transliteration of
graphrag-rs).  The Spark pipeline's output is scored against this
(P/R ≥ 0.95 on distinct (subj, pred, obj); target exact equality).

Pipeline parity map (reference files relative to /root/reference/):
  assemble_documents   — lib.rs:313-342 (one conversation = one Document)
  chunk                — text/mod.rs:123-168
  extract              — entity/mod.rs:97-187 per chunk (lib.rs:514-523)
  triples              — entity/mod.rs:822-889 + lib.rs:543-587
  entity dedup         — graph/mod.rs:243-265 (merge by entity_id)
  canonicalize         — entity/string_similarity_linker.rs:68-127; we take
                         the connected-components closure of the greedy
                         clustering (order-independent superset at the same
                         threshold; see SURVEY.md §7 risk 2)
  communities (level 0)— graph/analytics.rs:97-155 (connected components)
"""

from __future__ import annotations

import re

from collections import defaultdict
from dataclasses import dataclass, field

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG
from graphrag_rs_spark import reference_logic as rl


@dataclass
class OracleResult:
    documents: list[dict] = field(default_factory=list)
    chunks: list[dict] = field(default_factory=list)
    entities: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)
    triples: list[dict] = field(default_factory=list)
    canonical_map: dict[str, str] = field(default_factory=dict)
    canonical_triples: list[dict] = field(default_factory=list)
    communities: list[dict] = field(default_factory=list)

    def triple_set(self, canonical: bool = True) -> set[tuple[str, str, str]]:
        rows = self.canonical_triples if canonical else self.triples
        return {(t["subj"], t["pred"], t["obj"]) for t in rows}


def assemble_documents(rows: list[dict]) -> list[dict]:
    """One conversation = one document; content = turns joined by '\\n' in
    turn_idx order.  Also emits per-turn (start, end) offsets into content
    so the per-turn text-equality invariant is checkable."""
    by_conv: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in rows:
        by_conv[r["conv_id"]].append((int(r["turn_idx"]), r["text"]))
    docs = []
    for conv_id in sorted(by_conv):
        # (turn_idx, text) — Spark's sort_array(struct(turn_idx, text))
        # tie-breaks duplicate turn_idx rows by text; a bare stable sort
        # on turn_idx would keep input order and diverge on such rows
        turns = sorted(by_conv[conv_id], key=lambda t: (t[0], t[1]))
        content = "\n".join(t[1] for t in turns)
        offsets = []
        pos = 0
        for turn_idx, text in turns:
            offsets.append({"turn_idx": turn_idx, "start": pos, "end": pos + len(text)})
            pos += len(text) + 1  # newline separator
        docs.append({"doc_id": conv_id, "content": content, "turn_offsets": offsets})
    return docs


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller string becomes root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def link_entities_cc(entities: list[dict], cfg: PipelineConfig) -> dict[str, str]:
    """Similarity graph at τ=cfg.link_min_similarity → CC → canonical map.

    Canonical member = max (confidence, entity_id) in each component
    (reference picks max confidence, string_similarity_linker.rs:106-117;
    entity_id is our deterministic tie-break).  Returns non-identity links
    only, matching the reference's HashMap<entity→canonical>.
    """
    uf = _UnionFind()
    ents = sorted(entities, key=lambda e: e["entity_id"])
    for i in range(len(ents)):
        for j in range(i + 1, len(ents)):
            e1, e2 = ents[i], ents[j]
            sim = rl.compute_similarity(
                e1["name"], e2["name"],
                same_type=e1["entity_type"] == e2["entity_type"],
                use_phonetic=cfg.link_use_phonetic,
                max_edit_distance=cfg.link_max_edit_distance,
            )
            if sim >= cfg.link_min_similarity:
                uf.union(e1["entity_id"], e2["entity_id"])
    comps: dict[str, list[dict]] = defaultdict(list)
    for e in ents:
        comps[uf.find(e["entity_id"])].append(e)
    links: dict[str, str] = {}
    for members in comps.values():
        if len(members) < 2:
            continue
        canonical = max(members, key=lambda e: (e["confidence"], e["entity_id"]))
        for e in members:
            if e["entity_id"] != canonical["entity_id"]:
                links[e["entity_id"]] = canonical["entity_id"]
    return links


def link_entities_greedy(entities: list[dict], cfg: PipelineConfig) -> dict[str, str]:
    """The reference's literal greedy single-pass clustering
    (string_similarity_linker.rs:68-127), for divergence tests."""
    ents = sorted(entities, key=lambda e: e["entity_id"])
    clustered: set[int] = set()
    clusters: list[list[int]] = []
    for i in range(len(ents)):
        if i in clustered:
            continue
        cluster = [i]
        clustered.add(i)
        for j in range(i + 1, len(ents)):
            if j in clustered:
                continue
            sim = rl.compute_similarity(
                ents[i]["name"], ents[j]["name"],
                same_type=ents[i]["entity_type"] == ents[j]["entity_type"],
                use_phonetic=cfg.link_use_phonetic,
                max_edit_distance=cfg.link_max_edit_distance,
            )
            if sim >= cfg.link_min_similarity:
                cluster.append(j)
                clustered.add(j)
        if len(cluster) > 1:
            clusters.append(cluster)
    links: dict[str, str] = {}
    for cluster in clusters:
        canonical = max(
            (ents[k] for k in cluster),
            key=lambda e: (e["confidence"], e["entity_id"]),
        )
        for k in cluster:
            if ents[k]["entity_id"] != canonical["entity_id"]:
                links[ents[k]["entity_id"]] = canonical["entity_id"]
    return links


def run_oracle_pipeline(
    rows: list[dict], cfg: PipelineConfig = DEFAULT_CONFIG
) -> OracleResult:
    res = OracleResult()
    res.documents = assemble_documents(rows)

    entity_acc: dict[str, dict] = {}
    triple_acc: dict[tuple[str, str, str], dict] = {}

    splitter = (rl.hierarchical_chunk_text
                if cfg.chunking_strategy == "hierarchical"
                else rl.chunk_text)   # same dispatch as stages/chunking
    inc_re = re.compile(cfg.include_name_pattern) \
        if cfg.include_name_pattern else None
    exc_res = [re.compile(p) for p in cfg.exclude_name_patterns]

    for doc in res.documents:
        doc_id, content = doc["doc_id"], doc["content"]
        for ch in splitter(content, cfg.chunk_size, cfg.chunk_overlap):
            chunk_id = f"{doc_id}_{ch.seq}"
            res.chunks.append({
                "chunk_id": chunk_id, "doc_id": doc_id, "content": ch.content,
                "start_offset": ch.start, "end_offset": ch.end,
            })
            extracted = rl.extract_from_chunk(
                ch.content, cfg.entity_types, cfg.min_confidence)
            # E6 allow/exclude name filters, mirroring the Spark array
            # filter (extraction.py) so entities/mentions/pairs all see
            # the same view.  Dialect caveat: Python `re` here vs Java
            # rlike there — keep patterns to the shared subset.
            if inc_re is not None:
                extracted = [e for e in extracted
                             if inc_re.search(e.name)]
            if exc_res:
                extracted = [e for e in extracted
                             if not any(x.search(e.name) for x in exc_res)]
            for e in extracted:
                for m in e.mentions:
                    res.mentions.append({
                        "entity_id": e.entity_id, "chunk_id": chunk_id,
                        "start_offset": m.start, "end_offset": m.end,
                        "confidence": e.confidence,
                    })
                cur = entity_acc.get(e.entity_id)
                if cur is None:
                    entity_acc[e.entity_id] = {
                        "entity_id": e.entity_id, "name": e.name,
                        "entity_type": e.entity_type,
                        "confidence": e.confidence,
                        "mention_count": len(e.mentions),
                    }
                else:
                    cur["mention_count"] += len(e.mentions)
                    # deterministic name/confidence merge == Spark's
                    # max_by(name, struct(confidence, name)) + max(confidence)
                    if (e.confidence, e.name) > (cur["confidence"], cur["name"]):
                        cur["name"] = e.name
                    if e.confidence > cur["confidence"]:
                        cur["confidence"] = e.confidence
            # pair only entities with ≥1 verbatim mention in the chunk
            # (reference lib.rs:545-556 filters its pair loop to
            # mentioned entities); order preserved
            pairable = [e for e in extracted if e.mentions]
            if cfg.extract_relationships and len(pairable) >= 2:
                for s, p, o in rl.extract_chunk_triples(pairable, ch.content):
                    key = (s, p, o)
                    cur = triple_acc.get(key)
                    if cur is None:
                        triple_acc[key] = {
                            "subj": s, "pred": p, "obj": o,
                            "confidence": cfg.relationship_confidence,
                            "context_chunks": [chunk_id],
                        }
                    elif chunk_id not in cur["context_chunks"]:
                        cur["context_chunks"].append(chunk_id)

    res.entities = sorted(entity_acc.values(), key=lambda e: e["entity_id"])
    res.triples = [triple_acc[k] for k in sorted(triple_acc)]

    # Canonicalization (CC closure) + triple rewrite (L5)
    res.canonical_map = link_entities_cc(res.entities, cfg)
    canon = lambda x: res.canonical_map.get(x, x)  # noqa: E731
    canon_acc: dict[tuple[str, str, str], dict] = {}
    for t in res.triples:
        key = (canon(t["subj"]), t["pred"], canon(t["obj"]))
        cur = canon_acc.get(key)
        if cur is None:
            canon_acc[key] = {
                "subj": key[0], "pred": key[1], "obj": key[2],
                "confidence": t["confidence"],
                "context_chunks": list(t["context_chunks"]),
            }
        else:
            for c in t["context_chunks"]:
                if c not in cur["context_chunks"]:
                    cur["context_chunks"].append(c)
    res.canonical_triples = [canon_acc[k] for k in sorted(canon_acc)]

    # Communities level 0 = connected components of the canonical graph
    uf = _UnionFind()
    nodes = {canon(e["entity_id"]) for e in res.entities}
    for n in sorted(nodes):
        uf.find(n)
    for t in res.canonical_triples:
        uf.union(t["subj"], t["obj"])
    res.communities = sorted(
        ({"entity_id": n, "level": 0, "community": uf.find(n)} for n in nodes),
        key=lambda r: r["entity_id"],
    )
    return res

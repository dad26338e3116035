"""E8-E10: gleaning-style iterative LLM extraction as a driver round-loop
over batched Arrow UDF passes.

Reference behavior (entity/gleaning_extractor.rs:112-223):
  round 1  — extraction prompt per chunk → entities + relationships
  round r  — (a) LLM completion check; complete chunks stop participating
             (b) continuation prompt carrying the already-found entity
                 names → only NEW records; a chunk yielding nothing new
                 also stops
  merge    — per lowercase name keep the LONGER description, later rounds
             win only strictly (gleaning_extractor.rs:229-272, LightRAG)
  convert  — entity_id = "{TYPE}_{normalized_name}" (:440-463), fixed 0.9
             confidence (:320-327); mentions re-found in chunk text with a
             case-insensitive fallback at 0.85 (:334-374); relationships
             resolved by lowercase entity name and deduped on
             (src, tgt, type) keeping the first (:417-435)

Spark mapping: each round is ONE mapInPandas pass over the still-active
chunks — the client sees whole Arrow batches, so a real HTTP client can
pipeline its requests (the reference awaits one chunk at a time; batching
is the idiomatic Spark improvement, not a semantic change).  The round
loop lives on the driver: rounds are inherently sequential (each prompt
embeds the previous rounds' findings).  Per-round outputs are
localCheckpoint'ed — same geometric-lineage defense as the CC loop.

The LM itself is the pluggable seam (SURVEY §2.9): any zero-arg factory
returning an object with `complete(prompts: list[str]) -> list[str]`
speaking the reference's wire format (JSON ExtractionOutput, possibly
```json-fenced — llm_extractor.rs:184-256).  No LLM endpoint exists in
this environment, so `FakeGleaningLM` below is the clearly-marked
deterministic stand-in: it pattern-extracts (reference_logic) and reveals
entities in hash-assigned waves so the multi-round machinery is genuinely
exercised and testable.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG

# one row per parsed record; rec_idx preserves response order for
# "keep first" tie-breaks
GLEAN_SCHEMA = (
    "chunk_id string, kind string, name string, entity_type string, "
    "description string, src string, tgt string, strength double, "
    "rec_idx long"
)

MENTION_SCHEMA = (
    "entity_id string, chunk_id string, start_offset long, "
    "end_offset long, confidence double"
)

_TEXT_MARK = "TEXT:\n"
_FOUND_MARK = "ALREADY_FOUND:\n"


# --------------------------------------------------------------- prompts

def extraction_prompt(content: str, entity_types: tuple[str, ...]) -> str:
    return (
        "Extract entities and relationships from the text. Respond with "
        "JSON {\"entities\": [{\"name\", \"entity_type\", \"description\"}], "
        "\"relationships\": [{\"source\", \"target\", \"description\", "
        f"\"strength\"}}]}}. Entity types: {', '.join(entity_types)}.\n"
        f"{_TEXT_MARK}{content}"
    )


def continuation_prompt(content: str, found: list[str],
                        entity_types: tuple[str, ...]) -> str:
    return (
        "MANY entities were missed. Add ONLY new ones, same JSON format. "
        f"Entity types: {', '.join(entity_types)}.\n"
        f"{_FOUND_MARK}{json.dumps(sorted(found))}\n"
        f"{_TEXT_MARK}{content}"
    )


def completion_prompt(content: str, found: list[str]) -> str:
    return (
        "Answer YES if every entity in the text was already found, "
        "else NO.\n"
        f"{_FOUND_MARK}{json.dumps(sorted(found))}\n"
        f"{_TEXT_MARK}{content}"
    )


# ---------------------------------------------------------- wire parsing

def parse_extraction_response(text: str) -> tuple[list[dict], list[dict]]:
    """JSON ExtractionOutput with the reference's fallback ladder
    (llm_extractor.rs:184-256): direct parse → fenced block → first{..last}
    span → empty on failure (never raises)."""
    candidates = [text]
    if "```" in text:
        for fence in ("```json", "```"):
            start = text.find(fence)
            if start >= 0:
                body = text[start + len(fence):]
                end = body.find("```")
                if end > 0:
                    candidates.append(body[:end].strip())
    lo, hi = text.find("{"), text.rfind("}")
    if 0 <= lo < hi:
        candidates.append(text[lo:hi + 1])
    for cand in candidates:
        try:
            obj = json.loads(cand)
        except (json.JSONDecodeError, TypeError):
            continue
        if isinstance(obj, dict):
            ents = [e for e in obj.get("entities", [])
                    if isinstance(e, dict) and e.get("name")]
            rels = [r for r in obj.get("relationships", [])
                    if isinstance(r, dict)
                    and r.get("source") and r.get("target")]
            return ents, rels
    return [], []


def _normalize_name(name: str) -> str:
    """gleaning_extractor.rs:440-463: lowercase, non-alnum→space,
    whitespace-split, join with '_'."""
    out = []
    for ch in name.lower():
        out.append(ch if (ch.isalnum() or ch == "_") else " ")
    return "_".join("".join(out).split())


def entity_id_for(name: str, entity_type: str) -> str:
    return f"{entity_type}_{_normalize_name(name)}"


# ------------------------------------------------------------ round pass

def _glean_round(
    active: DataFrame,
    client_factory: Callable[[], object],
    entity_types: tuple[str, ...],
    first_round: bool,
) -> DataFrame:
    """One batched LM pass over (chunk_id, content, found array<string>).

    Rounds ≥ 2 make two batched calls, mirroring the reference's
    check_completion + extract_additional pair; chunks whose completion
    answer is YES emit nothing (and therefore drop out upstream).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            if pdf.empty:
                continue
            ids = list(pdf["chunk_id"])
            texts = list(pdf["content"])
            founds = [list(f) for f in pdf["found"]]
            if first_round:
                todo = list(range(len(ids)))
            else:
                answers = client.complete(
                    [completion_prompt(t, f)
                     for t, f in zip(texts, founds)])
                todo = [i for i, a in enumerate(answers)
                        if not str(a).strip().upper().startswith("YES")]
            if not todo:
                continue
            prompts = [
                extraction_prompt(texts[i], entity_types) if first_round
                else continuation_prompt(texts[i], founds[i], entity_types)
                for i in todo
            ]
            responses = client.complete(prompts)
            out: dict[str, list] = {k: [] for k in (
                "chunk_id", "kind", "name", "entity_type", "description",
                "src", "tgt", "strength", "rec_idx")}

            def emit(cid, kind, idx, **kw):
                out["chunk_id"].append(cid)
                out["kind"].append(kind)
                out["rec_idx"].append(idx)
                out["name"].append(kw.get("name", ""))
                out["entity_type"].append(kw.get("entity_type", ""))
                out["description"].append(kw.get("description", ""))
                out["src"].append(kw.get("src", ""))
                out["tgt"].append(kw.get("tgt", ""))
                # never raises on a malformed response (module contract):
                # null / non-numeric strength degrades to the default
                # instead of killing the whole extraction task
                try:
                    out["strength"].append(float(kw.get("strength", 0.0)))
                except (TypeError, ValueError):
                    out["strength"].append(0.5)

            for i, resp in zip(todo, responses):
                cid = ids[i]
                ents, rels = parse_extraction_response(resp)
                idx = 0
                for e in ents:
                    emit(cid, "entity", idx,
                         name=str(e["name"]),
                         entity_type=str(e.get("entity_type", "CONCEPT")),
                         description=str(e.get("description", "")))
                    idx += 1
                for r in rels:
                    emit(cid, "relationship", idx,
                         src=str(r["source"]), tgt=str(r["target"]),
                         description=str(r.get("description", "related")),
                         strength=r.get("strength", 0.5))
                    idx += 1
                # reference stop rule (gleaning_extractor.rs:189-196):
                # stop ONLY when a round returns literally nothing —
                # a round re-emitting known entities is non-empty, its
                # rows flow into the longest-description merge and the
                # chunk keeps gleaning (llm_extractor.rs does not filter
                # known names)
            if out["chunk_id"]:
                yield pd.DataFrame(out)

    return active.mapInPandas(run, schema=GLEAN_SCHEMA)


# ------------------------------------------------------------- main loop

def gleaning_extract(
    chunks: DataFrame,
    client_factory: Callable[[], object],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_rounds: int = 4,
    entity_types: tuple[str, ...] = (
        "PERSON", "ORGANIZATION", "LOCATION", "EVENT", "CONCEPT"),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """chunks(chunk_id, content) → (entities, mentions, relationships).

    entities:       chunk_id, entity_id, name, entity_type, description,
                    confidence (0.9 — LLM-extracted, reference :320-327)
    mentions:       entity_id, chunk_id, start_offset, end_offset,
                    confidence (0.9 exact / 0.85 case-insensitive)
    relationships:  chunk_id, subj, pred, obj, confidence

    Driver loop = reference rounds; each round one (or two, for the
    completion check) batched LM passes over only the still-active
    chunks.  Per-round results are localCheckpoint'ed and unioned.
    """
    active = chunks.select("chunk_id", "content")
    rounds: list[DataFrame] = []

    for rnd in range(1, max_rounds + 1):
        if rnd == 1:
            inp = active.withColumn(
                "found", F.array().cast("array<string>"))
        else:
            all_so_far = rounds[0]
            for r in rounds[1:]:
                all_so_far = all_so_far.union(r)
            found_per_chunk = (
                all_so_far.filter(F.col("kind") == "entity")
                .groupBy("chunk_id")
                .agg(F.sort_array(F.collect_set("name")).alias("found"))
            )
            inp = active.join(found_per_chunk, "chunk_id", "left") \
                .withColumn("found", F.coalesce(
                    "found", F.array().cast("array<string>")))
        new = _glean_round(inp, client_factory, entity_types,
                           first_round=(rnd == 1)) \
            .withColumn("round", F.lit(rnd)) \
            .localCheckpoint(eager=True)
        rounds.append(new)
        if rnd == 1:
            continue                      # reference always tries round 2
        survivors = new.select("chunk_id").distinct()
        active = active.join(survivors, "chunk_id", "semi")
        if new.isEmpty():
            break

    records = rounds[0]
    for r in rounds[1:]:
        records = records.union(r)
    records = records.persist()

    # E9 merge (LightRAG): per (chunk, lower(name)) keep the longest
    # description; strict ties keep the earliest (round, rec_idx)
    ent_rec = records.filter(F.col("kind") == "entity")
    merged = (
        ent_rec.groupBy("chunk_id", F.lower("name").alias("name_key"))
        .agg(F.max_by(
            F.struct("name", "entity_type", "description"),
            F.struct(F.length("description").alias("l"),
                     (-F.col("round")).alias("nr"),
                     (-F.col("rec_idx")).alias("ni"))).alias("w"))
        .select("chunk_id", "name_key",
                F.col("w.name").alias("name"),
                F.col("w.entity_type").alias("entity_type"),
                F.col("w.description").alias("description"))
    )
    # Unicode classes, not [^a-z0-9], so the SQL id agrees with
    # entity_id_for/_normalize_name (Python isalnum and the reference's
    # char::is_alphanumeric are Unicode-aware — 'Café' must keep the é)
    id_expr = F.concat_ws(
        "_", "entity_type",
        F.array_join(F.split(F.trim(F.regexp_replace(
            F.lower("name"), r"[^\p{L}\p{N}_]+", " ")), " +"), "_"))
    entities = merged.select(
        "chunk_id", id_expr.alias("entity_id"), "name", "entity_type",
        "description", F.lit(0.9).alias("confidence"), "name_key",
    ).persist()

    # mentions: re-scan chunk text per merged entity (exact then
    # case-insensitive — gleaning_extractor.rs:334-374)
    ent_by_chunk = entities.groupBy("chunk_id").agg(
        F.sort_array(F.collect_list(
            F.struct("entity_id", "name"))).alias("ents"))
    scan_src = chunks.select("chunk_id", "content") \
        .join(ent_by_chunk, "chunk_id")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "entity_id", "chunk_id", "start_offset", "end_offset",
                "confidence")}
            for cid, text, ents in zip(
                    pdf["chunk_id"], pdf["content"], pdf["ents"]):
                for ent in ents:
                    eid, name = ent["entity_id"], ent["name"]
                    spans = _find_spans(text, name)
                    conf = 0.9
                    if not spans:
                        # offsets measured in text.lower() — a quirk the
                        # REFERENCE shares verbatim (gleaning_extractor
                        # .rs:356-370 searches text_lower and records
                        # those positions); for the rare characters whose
                        # lowercase changes string length ('İ') both
                        # engines skew identically, which is the parity
                        # contract here
                        spans = _find_spans(text.lower(), name.lower())
                        conf = 0.85
                    for s in spans:
                        out["entity_id"].append(eid)
                        out["chunk_id"].append(cid)
                        out["start_offset"].append(s)
                        out["end_offset"].append(s + len(name))
                        out["confidence"].append(conf)
            if out["entity_id"]:
                yield pd.DataFrame(out)

    mentions = scan_src.mapInPandas(scan, schema=MENTION_SCHEMA)

    # relationships: resolve endpoints by lowercase name within the same
    # chunk; drop unresolved (reference warns + skips); dedup on
    # (subj, obj, pred) keeping the earliest record
    rel = records.filter(F.col("kind") == "relationship").select(
        "chunk_id", "src", "tgt", "description", "strength",
        "round", "rec_idx")
    nm = entities.select("chunk_id", "name_key", "entity_id")
    resolved = (
        rel.alias("r")
        .join(nm.alias("a"),
              (F.col("r.chunk_id") == F.col("a.chunk_id")) &
              (F.lower(F.col("r.src")) == F.col("a.name_key")))
        .join(nm.alias("b"),
              (F.col("r.chunk_id") == F.col("b.chunk_id")) &
              (F.lower(F.col("r.tgt")) == F.col("b.name_key")))
        .select(F.col("r.chunk_id").alias("chunk_id"),
                F.col("a.entity_id").alias("subj"),
                F.col("r.description").alias("pred"),
                F.col("b.entity_id").alias("obj"),
                F.col("r.strength").alias("strength"),
                F.col("r.round").alias("round"),
                F.col("r.rec_idx").alias("rec_idx"))
    )
    relationships = (
        resolved.groupBy("chunk_id", "subj", "pred", "obj")
        .agg(F.min_by("strength", F.struct("round", "rec_idx"))
             .alias("confidence"))
    )
    return entities.drop("name_key"), mentions, relationships


def _find_spans(text: str, name: str) -> list[int]:
    spans, start = [], 0
    if not name:
        return spans
    while True:
        pos = text.find(name, start)
        if pos < 0:
            return spans
        spans.append(pos)
        start = pos + len(name)


# ------------------------------------------------- deterministic fake LM

class FakeGleaningLM:
    """DETERMINISTIC STAND-IN for an LLM endpoint (none exists in this
    environment — task instructions direct a deterministic fake with the
    Spark plumbing kept real).

    Behavior: pattern-extracts entities from the prompt's TEXT section
    (reference_logic transliteration = the reference's own no-LLM
    fallback), then reveals them in `n_waves` md5-assigned waves — each
    continuation round surfaces the next wave, so the gleaning loop,
    per-chunk dropout, and E9 merge all execute for real.  Wave ≥ 1
    re-emits the alphabetically-first known entity with a strictly longer
    description to exercise the longer-description-wins merge.  Responses
    are JSON, fenced half the time to exercise the parser's fallback
    ladder.  Completion answers YES iff no unrevealed entity remains.
    """

    def __init__(self, n_waves: int = 2, entity_types: tuple[str, ...] =
                 ("PERSON", "ORGANIZATION", "LOCATION", "CONCEPT")):
        self.n_waves = n_waves
        self.entity_types = entity_types

    # -- helpers ----------------------------------------------------
    def _all_entities(self, text: str) -> list[tuple[str, str]]:
        from graphrag_rs_spark import reference_logic as rl
        ents = rl.extract_from_chunk(text, self.entity_types, 0.7)
        return sorted({(e.name, e.entity_type) for e in ents})

    def _wave(self, name: str) -> int:
        return hashlib.md5(name.encode()).digest()[0] % self.n_waves

    @staticmethod
    def _split(prompt: str) -> tuple[str, set[str]]:
        text = prompt.split(_TEXT_MARK, 1)[1] if _TEXT_MARK in prompt \
            else prompt
        found: set[str] = set()
        if _FOUND_MARK in prompt:
            line = prompt.split(_FOUND_MARK, 1)[1].split("\n", 1)[0]
            try:
                found = {s.lower() for s in json.loads(line)}
            except json.JSONDecodeError:
                pass
        return text, found

    # -- the wire protocol ------------------------------------------
    def complete(self, prompts: list[str]) -> list[str]:
        return [self._one(p) for p in prompts]

    def _one(self, prompt: str) -> str:
        text, found = self._split(prompt)
        ents = self._all_entities(text)
        if prompt.startswith("Answer YES"):
            missing = [n for n, _ in ents if n.lower() not in found]
            return "YES" if not missing else "NO"
        unrevealed = [(n, t) for n, t in ents if n.lower() not in found]
        # Emit the minimum AVAILABLE wave among the unrevealed entities —
        # in every round, not just continuations.  A literal "round 1 =
        # wave 0" would make a chunk whose entities all hash to wave ≥ 1
        # emit nothing forever (empty found-list keeps re-taking the
        # round-1 branch), silently dropping its entities from the union.
        waves = sorted({self._wave(n) for n, _ in unrevealed})
        emit = [] if not waves else [
            (n, t) for n, t in unrevealed if self._wave(n) == waves[0]]
        payload = {
            "entities": [
                {"name": n, "entity_type": t,
                 "description": f"{t} named {n}"} for n, t in emit],
            "relationships": [],
        }
        if found and emit:
            # re-emit an already-known entity with a longer description
            known = sorted(found)
            payload["entities"].append({
                "name": known[0], "entity_type": "CONCEPT",
                "description":
                    f"CONCEPT named {known[0]}, seen again with more "
                    "surrounding context in a later gleaning round"})
        if len(emit) >= 2:
            a, b = emit[0][0], emit[1][0]
            payload["relationships"].append(
                {"source": a, "target": b,
                 "description": "related_to", "strength": 0.8})
        body = json.dumps(payload)
        # fence half the responses (md5 parity) → fallback parser coverage
        if hashlib.md5(text.encode()).digest()[0] % 2:
            return f"Here is the extraction:\n```json\n{body}\n```\n"
        return body

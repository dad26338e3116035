"""ROGRAG query-intent classification (rograg/intent_classifier.rs).

Quirk-for-quirk port of the reference's deterministic keyword/regex
scorer (intent_classifier.rs:312-567) as a BATCH operator: the
reference classifies one query at a time on the driver; here a whole
query column is classified in one pass of pure Catalyst expressions
(contains/rlike/translate — JVM codegen, no Python), which is what a
100 TB curation pipeline needs (e.g. routing or filtering millions of
instruction-tuning prompts by intent).

Scoring (intent_classifier.rs:537-567): per intent,
    score = min(1, 0.5·kw_matched/kw_total [if any]
                 + 0.5·rx_matched/rx_total [if any])
Keywords match by SUBSTRING contains on the lowercased query (the
reference's quirk — "standard" contains "and"); regexes by unanchored
search.  Inappropriate content short-circuits (confidence 1, refuse).
Ambiguity: any of the next-2 intents scoring > 0.8·primary
(intent_classifier.rs:496-501).  Refusal: primary < refusal_threshold
(default 0.8, config:199) OR ambiguous.  Complexity
(intent_classifier.rs:577-594): 0.3·min(wc/20,1) + 0.2·min(sents/3,1)
+ 0.2·min(avg_alpha_word_len/8,1) + 0.3·[conjunction/subordination],
capped at 1.

Documented divergences:
- tie order: the reference sorts a HashMap's iteration order with an
  f32 partial_cmp — ties are nondeterministic run-to-run.  Here ties
  break on intent name ascending (score desc, name asc), determinism
  the oracle can replay.
- f64 arithmetic instead of f32; every score rounded to 6 dp BEFORE
  ranking (repo invariant).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

# (name, keywords, regex patterns) — verbatim from
# intent_classifier.rs:312-410; single source of truth, the DuckDB
# oracle is generated from these same lists.  All patterns are valid in
# both Java regex (Spark rlike) and RE2 (DuckDB regexp_matches).
INTENTS: list[tuple[str, list[str], list[str]]] = [
    ("factual",
     ["what", "which", "how many", "how much"],
     [r"\bwhat (?:is|are|was|were)\b", r"\bwhich (?:is|are|was|were)\b",
      r"\bhow many\b", r"\bhow much\b"]),
    ("definitional",
     ["define", "definition", "meaning", "explain", "what is"],
     [r"\bdefine\b", r"\bdefinition of\b", r"\bmeaning of\b",
      r"\bexplain what\b",
      r"\bwhat (?:is|are) (?:the )?(?:concept|idea|notion) of\b"]),
    ("relational",
     ["relationship", "related", "connection", "between", "and"],
     [r"\brelationship between\b", r"\bhow (?:is|are) .+ related to\b",
      r"\bconnection between\b", r"\b\w+ and \w+\b"]),
    ("temporal",
     ["when", "time", "date", "year", "before", "after", "during"],
     [r"\bwhen (?:did|was|were|will|is|are)\b", r"\bwhat (?:time|date|year)\b",
      r"\bbefore .+ happened\b", r"\bafter .+ happened\b",
      r"\bduring .+ period\b"]),
    ("causal",
     ["why", "because", "cause", "reason", "result", "due to"],
     [r"\bwhy (?:did|was|were|is|are|do|does)\b", r"\bwhat (?:caused|causes)\b",
      r"\breason for\b", r"\bdue to what\b", r"\bwhat led to\b"]),
    ("comparative",
     ["compare", "difference", "versus", "vs", "better", "worse", "similar"],
     [r"\bcompare .+ (?:to|with|and)\b", r"\bdifference between\b",
      r"\b.+ (?:versus|vs) .+\b", r"\bwhich is (?:better|worse)\b",
      r"\bhow (?:similar|different)\b"]),
    ("summary",
     ["summarize", "overview", "summary", "tell me about", "describe"],
     [r"\bsummarize\b", r"\bgive (?:me )?(?:an )?overview\b",
      r"\btell me about\b", r"\bdescribe .+\b",
      r"\bwhat (?:can you tell me )?about\b"]),
]

INAPPROPRIATE_RX = r"\b(?:hate|violence|harm|illegal|inappropriate)\b"
CONSTRUCT_TERMS = [" and ", " or ", " but ",
                   " because ", " since ", " although "]


def _intent_score(q, kws: list[str], rxs: list[str]):
    kwm = reduce(lambda a, b: a + b,
                 [F.when(q.contains(k), 1).otherwise(0) for k in kws])
    rxm = reduce(lambda a, b: a + b,
                 [F.when(q.rlike(rx), 1).otherwise(0) for rx in rxs])
    kw_part = F.when(kwm > 0, kwm / float(len(kws)) * 0.5).otherwise(0.0)
    rx_part = F.when(rxm > 0, rxm / float(len(rxs)) * 0.5).otherwise(0.0)
    return F.round(F.least(kw_part + rx_part, F.lit(1.0)), 6)


def _complexity(q):
    wc = F.size(F.filter(F.split(q, " "), lambda x: x != ""))
    sents = F.greatest(F.lit(1), F.length(q)
                       - F.length(F.translate(q, ".?!", "")))
    alpha = F.length(F.regexp_replace(q, "[^a-z]", ""))
    avg_wl = alpha.cast("double") / F.greatest(wc, F.lit(1))
    lc = F.least(wc / 20.0, F.lit(1.0))
    sc = F.least(sents / 3.0, F.lit(1.0))
    wlc = F.least(avg_wl / 8.0, F.lit(1.0))
    construct = F.when(
        reduce(lambda a, b: a | b, [q.contains(t) for t in CONSTRUCT_TERMS]),
        0.3).otherwise(0.0)
    return F.round(
        F.least(lc * 0.3 + sc * 0.2 + wlc * 0.2 + construct, F.lit(1.0)), 6)


def classify_intent(
    queries: DataFrame,
    id_col: str = "query_id",
    query_col: str = "query",
    refusal_threshold: float = 0.8,
) -> DataFrame:
    """→ (query_id, intent, confidence, should_refuse, complexity).

    intent ∈ {the 7 pattern intents} ∪ {ambiguous, inappropriate};
    should_refuse is 0/1 (int, for cross-engine hashing)."""
    q = F.lower(F.col(query_col))
    scored = F.array(*[
        F.struct((-_intent_score(q, kws, rxs)).alias("ns"),
                 F.lit(name).alias("intent"))
        for name, kws, rxs in INTENTS])
    pos = F.sort_array(F.filter(scored, lambda x: x.ns < 0))
    primary = F.round(-F.try_element_at(pos, F.lit(1)).ns, 6)
    amb = (
        F.coalesce(-F.try_element_at(pos, F.lit(2)).ns > primary * 0.8, F.lit(False))
        | F.coalesce(-F.try_element_at(pos, F.lit(3)).ns > primary * 0.8,
                     F.lit(False)))
    inap = q.rlike(INAPPROPRIATE_RX)
    empty = F.size(pos) == 0
    refuse = (primary < refusal_threshold) | amb
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.when(inap, "inappropriate")
        .when(empty, "ambiguous")
        .when(amb, "ambiguous")
        .otherwise(F.try_element_at(pos, F.lit(1)).intent).alias("intent"),
        F.when(inap, 1.0).when(empty, 0.0)
        .otherwise(primary).alias("confidence"),
        F.when(inap | empty, 1)
        .otherwise(refuse.cast("int")).alias("should_refuse"),
        F.when(inap, 0.0).otherwise(_complexity(q)).alias("complexity"),
    )


def intent_oracle_exprs() -> tuple[str, str, str]:
    """DuckDB SQL fragments generated from the SAME pattern tables:
    (per-intent score select-list over alias `q`, complexity expression
    over alias `q`, inappropriate regex) — used by oracle_sql()."""
    parts = []
    for name, kws, rxs in INTENTS:
        kwm = " + ".join(
            f"(case when contains(q, '{k}') then 1 else 0 end)"
            for k in kws)
        rxm = " + ".join(
            f"(case when regexp_matches(q, '{rx}') then 1 else 0 end)"
            for rx in rxs)
        parts.append(
            f"round(least((case when ({kwm}) > 0 then ({kwm}) / "
            f"{float(len(kws))} * 0.5 else 0.0 end) + (case when ({rxm}) "
            f"> 0 then ({rxm}) / {float(len(rxs))} * 0.5 else 0.0 end), "
            f"1.0), 6) as s_{name}")
    construct = " or ".join(f"contains(q, '{t}')" for t in CONSTRUCT_TERMS)
    complexity = f"""round(least(
        least(len(list_filter(string_split(q, ' '), x -> x <> ''))
              / 20.0, 1.0) * 0.3
        + least(greatest(1, length(q) - length(translate(q, '.?!', '')))
                / 3.0, 1.0) * 0.2
        + least((length(regexp_replace(q, '[^a-z]', '', 'g'))::DOUBLE
                 / greatest(len(list_filter(string_split(q, ' '),
                                            x -> x <> '')), 1))
                / 8.0, 1.0) * 0.2
        + (case when {construct} then 0.3 else 0.0 end), 1.0), 6)"""
    return ", ".join(parts), complexity, INAPPROPRIATE_RX

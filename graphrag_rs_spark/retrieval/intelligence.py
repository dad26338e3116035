"""Query intelligence — rewriting, expansion, feedback (query/intelligence.rs).

The reference rewrites one query at a time on the driver
(intelligence.rs:92-118 `rewrite_query`): normalize → detect query
type (:170-229) → apply the first matching template of that type
(:233-240, replace-ALL) → expand synonyms in word order with
first-occurrence dedup (:243-261) → stop-word key terms (:264-270) →
confidence from specificity + relevance feedback (:273-294).  Here a
whole query column is rewritten in ONE narrow Catalyst projection —
the order-dependent synonym fold runs as a per-row `F.aggregate` over
the word array (JVM codegen, zero shuffle, no Python), which is the
posture a 100 TB curation pipeline needs (rewriting billions of search
/ instruction queries is an embarrassingly-parallel map).  Only the
optional relevance-feedback join adds a shuffle.

Synonym-dedup quirk preserved (:247-257): original WORDS are always
appended (duplicates included); a SYNONYM is appended only if the term
is not already in the expanded list.  Equivalent closed form (used by
the DuckDB oracle, proved by induction: the earliest equal candidate
in (word_pos, synonym_pos) order is always kept): keep every word, and
keep a synonym iff it is the first candidate with that term.

Relevance feedback (:143-149) is a sequential EWMA fold
(r ← 0.5·r + 0.5·s, r₀ = 0.5).  Batch closed form over events
e₁..e_n in id order: r = 0.5^(n+1) + Σ_k s_k·0.5^(n-k+1).  We bound
state to the LAST 20 events per term (documented divergence —
unbounded per-key history is exactly what kills a streaming
aggregation at scale); with scores synthesized as m/128 every
contribution is an exact power-of-two multiple, so the cross-engine
sum is exact and order-independent (no 6-dp straddle risk).

Other divergences: f64 for f32; floats rounded to 6 dp at output
(emitted, never ranked).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

# intelligence.rs:297-307 — insertion order preserved.
SYNONYMS: list[tuple[str, list[str]]] = [
    ("find", ["search", "locate"]),
    ("person", ["individual", "people"]),
    ("company", ["organization", "business", "firm"]),
    ("show", ["display", "present"]),
    ("get", ["retrieve", "fetch"]),
    ("large", ["big", "huge", "significant"]),
    ("small", ["tiny", "minor"]),
    ("important", ["significant", "critical", "key"]),
]

# intelligence.rs:310-334 — (pattern, query_type, rewrite), insertion order.
TEMPLATES: list[tuple[str, str, str]] = [
    ("who is", "entity_lookup", "entity:"),
    ("what is", "entity_lookup", "define:"),
    ("how many", "aggregation", "count:"),
    ("compare", "comparison", "compare:"),
]

# intelligence.rs:338-343.
STOP_WORDS: list[str] = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for",
    "from", "has", "he", "in", "is", "it", "its", "of", "on",
    "that", "the", "to", "was", "will", "with",
]

FEEDBACK_WINDOW = 20  # bounded-state divergence, see module docstring


def _words(col: Column) -> Column:
    return F.filter(F.split(col, " "), lambda x: x != "")


def detect_query_type(q: Column) -> Column:
    """intelligence.rs:170-229 — evaluation order is load-bearing
    ('what is the relationship between…' must be relationship, not
    entity_lookup).  `q` must already be lowercased."""
    return (
        F.when(q.contains("relationship between") | q.contains("how does")
               | q.contains("related to") | q.contains("connection between"),
               "relationship")
        .when(q.startswith("who is") | q.startswith("what is")
              | q.startswith("define"), "entity_lookup")
        .when(q.startswith("how many") | q.startswith("count")
              | q.contains("total") | q.contains("sum")
              | q.contains("average"), "aggregation")
        .when(q.contains("compare") | q.contains("difference between")
              | q.contains("versus") | q.contains("vs"), "comparison")
        .when(q.contains("when") | q.contains("before") | q.contains("after")
              | q.contains("during") | q.contains("timeline"), "temporal")
        .when(q.contains("why") | q.contains("because") | q.contains("cause")
              | q.contains("reason") | q.contains("led to"), "causal")
        .otherwise("general"))


def _apply_templates(q: Column, qtype: Column) -> Column:
    out = None
    for pattern, ttype, rewrite in TEMPLATES:
        cond = (qtype == ttype) & q.contains(pattern)
        repl = F.replace(q, F.lit(pattern), F.lit(rewrite))
        out = F.when(cond, repl) if out is None else out.when(cond, repl)
    return out.otherwise(q)


def _syns(w: Column) -> Column:
    out = None
    for key, syns in SYNONYMS:
        arr = F.array(*[F.lit(s) for s in syns])
        out = F.when(w == key, arr) if out is None else out.when(w == key, arr)
    return out.otherwise(F.array().cast("array<string>"))


def fold_feedback(
    feedback: DataFrame,
    term_col: str = "term",
    order_col: str = "event_id",
    score_col: str = "score",
) -> DataFrame:
    """intelligence.rs:143-149 EWMA fold → (term, relevance), over the
    last FEEDBACK_WINDOW events per term.  Weights are exact powers of
    two (shiftleft, not pow) so the sum is order-independent."""
    ranked = (feedback
              .select(F.col(term_col).alias("term"),
                      F.col(order_col).alias("_oid"),
                      F.col(score_col).cast("double").alias("_s"))
              .withColumn("_rd", F.row_number().over(
                  Window.partitionBy("term").orderBy(F.desc("_oid"))))
              .filter(F.col("_rd") <= FEEDBACK_WINDOW))
    # After the window filter the group size IS min(n, WINDOW), so the
    # fold's base term 0.5^(m+1) needs no extra least().
    return ranked.groupBy("term").agg(F.expr(
        "sum(_s / cast(shiftleft(1L, _rd) as double))"
        " + 1.0 / cast(shiftleft(1L, cast(count(1) as int) + 1) as double)"
    ).alias("relevance"))


def rewrite_queries(
    queries: DataFrame,
    feedback: DataFrame | None = None,
    id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """intelligence.rs:92-118 batched → (query_id, query_type,
    rewritten, terms, n_terms, confidence)."""
    nq = F.lower(F.trim(F.col(query_col)))
    qtype = detect_query_type(nq)
    templated = _apply_templates(nq, qtype)
    words = _words(templated)
    # Candidate stream in reference order: each word (w=1) followed by
    # its synonyms (w=0); per-row fold keeps words unconditionally and
    # synonyms on first occurrence (intelligence.rs:247-257).
    cands = F.flatten(F.transform(words, lambda w: F.concat(
        F.array(F.struct(F.lit(1).alias("w"), w.alias("t"))),
        F.transform(_syns(w),
                    lambda s: F.struct(F.lit(0).alias("w"),
                                       s.alias("t"))))))
    expanded = F.aggregate(
        cands, F.array().cast("array<string>"),
        lambda acc, c: F.when((c.w == 1) | ~F.array_contains(acc, c.t),
                              F.concat(acc, F.array(c.t))).otherwise(acc))
    stop = F.array(*[F.lit(s) for s in STOP_WORDS])
    terms = F.filter(expanded, lambda t: ~F.array_contains(stop, t))
    wc = F.size(_words(nq))
    base = queries.select(
        F.col(id_col).alias("query_id"),
        qtype.alias("query_type"),
        F.array_join(expanded, " ").alias("rewritten"),
        terms.alias("_terms"),
        wc.alias("_wc"))
    if feedback is None:
        rel = F.lit(0.5)
        joined = base.withColumn("_rel", rel)
    else:
        # the feedback branch reads `base` twice (term explode + final
        # join) and the synonym-expansion fold is the expensive per-row
        # expression — materialize once.  localCheckpoint, not persist:
        # a per-call persist is never unpersisted (leaked CacheManager
        # entry); checkpoint storage is freed by the ContextCleaner
        base = base.localCheckpoint(eager=True)
        folded = fold_feedback(feedback)
        per_term = (base
                    .select("query_id", F.explode("_terms").alias("term"))
                    .join(folded, "term", "left")
                    .groupBy("query_id")
                    .agg(F.avg(F.coalesce(F.col("relevance"), F.lit(0.5)))
                         .alias("_rel")))
        joined = base.join(per_term, "query_id", "left")
    spec = F.least(F.size("_terms").cast("double")
                   / (F.col("_wc") + F.lit(1)), F.lit(1.0))
    conf = F.when(F.size("_terms") == 0, 0.5).otherwise(
        spec * 0.6 + F.coalesce(F.col("_rel"), F.lit(0.5)) * 0.4)
    return joined.select(
        "query_id", "query_type", "rewritten",
        F.array_join("_terms", " ").alias("terms"),
        F.size("_terms").alias("n_terms"),
        F.round(conf, 6).alias("confidence"))


def intelligence_oracle_exprs() -> dict[str, str]:
    """DuckDB fragments generated from the SAME constants.  The synonym
    fold is replayed by the closed form: candidates ordered by
    (word_pos, syn_pos), words always kept, synonyms kept iff
    row_number over term = 1 (see module docstring)."""
    qtype = """case
        when contains(q, 'relationship between') or contains(q, 'how does')
             or contains(q, 'related to') or contains(q, 'connection between')
          then 'relationship'
        when starts_with(q, 'who is') or starts_with(q, 'what is')
             or starts_with(q, 'define') then 'entity_lookup'
        when starts_with(q, 'how many') or starts_with(q, 'count')
             or contains(q, 'total') or contains(q, 'sum')
             or contains(q, 'average') then 'aggregation'
        when contains(q, 'compare') or contains(q, 'difference between')
             or contains(q, 'versus') or contains(q, 'vs')
          then 'comparison'
        when contains(q, 'when') or contains(q, 'before')
             or contains(q, 'after') or contains(q, 'during')
             or contains(q, 'timeline') then 'temporal'
        when contains(q, 'why') or contains(q, 'because')
             or contains(q, 'cause') or contains(q, 'reason')
             or contains(q, 'led to') then 'causal'
        else 'general' end"""
    tmpl = "case "
    for pattern, ttype, rewrite in TEMPLATES:
        tmpl += (f"when qt = '{ttype}' and contains(q, '{pattern}') "
                 f"then replace(q, '{pattern}', '{rewrite}') ")
    tmpl += "else q end"
    syn_rows = ", ".join(
        f"('{k}', {i + 1}, '{s}')"
        for k, syns in SYNONYMS for i, s in enumerate(syns))
    stop = "[" + ", ".join(f"'{s}'" for s in STOP_WORDS) + "]"
    return {"qtype": qtype, "template": tmpl, "syn_rows": syn_rows,
            "stop": stop, "window": str(FEEDBACK_WINDOW)}

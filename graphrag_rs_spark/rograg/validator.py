"""ROGRAG query/response validation (rograg/validator.rs) as a BATCH op.

The reference validates one query or one response at a time on the
driver (validator.rs:295-366 `validate_query`, :369-448
`validate_response`, quality checks :541-885).  Here whole columns of
queries/responses are validated in one pass of pure Catalyst
expressions (split / array_intersect / rlike — JVM codegen, no Python),
which is what a curation pipeline needs at 100 TB: score and gate
millions of RAG answers per hour, with every heuristic pushable and
the scan pruned to the three columns used.

Replayed quirk-for-quirk from validator.rs:
- sentence segmentation = raw split on [.!?] KEEPING trailing empties
  (Rust `content.split(['.','!','?'])` yields a trailing "" for text
  ending in punctuation; the denominators of the coherence and
  consistency scores therefore count it — :454, :785).
- coherence (:781-814): share of sentences containing one of 6
  connector words, min 1.0; single-sentence responses score 1.0 and
  never raise an issue.
- relevance (:847-884): Jaccard of the whitespace word SETS of
  lowercase query vs content; issue below 0.2.
- factual consistency (:452-478): per-sentence count of 4
  contradiction substring-pairs (not/is, never/always, none/all,
  impossible/possible), 1 − min(count / max(n_sentences,1), 1).
- completeness metric (:482-488): mean of length>100, sources>2 and
  subqueries>1 saturating ratios.
- readability (:492-505): 0.5 penalty above 30 words/sentence, 0.7
  above 8 alpha-chars/word (sentence_count here = PUNCTUATION CHAR
  count, max 1 — a different denominator than the split, :495).
- source credibility (:509-523): mean of min(n/5,1) and the
  distinct-10-char-prefix diversity ratio; 0.0 when no sources.
- issue flow (:369-430): quality-check issues are appended only when
  the check FAILS; thresholds length<10 / >4096, confidence<0.3,
  no-sources, query-term coverage<0.3 (words >3 chars only, :718-728),
  coherence<0.3, jaccard<0.2, consistency<0.5, safety regexes.
- query validation (:295-366): empty → critical (score 0), length
  >1000, 3 safety regexes on the lowercased query, no-alphabetic;
  score = 1 − min(0.1·issues, 0.8).

Documented divergences: f64 instead of f32, every float rounded to
6 dp at output (repo invariant — these scores are emitted, never
ranked, so no pre-ranking rounding is needed); whitespace = ' ' only
(the synthesised corpora are single-space ASCII; Rust
`split_whitespace` is any-unicode-ws); `is_alphabetic` = [A-Za-z]
(ASCII corpora).  Batch semantics: one row in → one row out, no
shuffle at all (narrow map over the responses table).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# validator.rs:269-274 — matched against the LOWERCASED text, so the
# patterns need no case flag.  Valid in Java regex and DuckDB RE2.
SAFETY_PATTERNS: list[str] = [
    r"\b(?:harm|violence|illegal|inappropriate|offensive)\b",
    r"\b(?:hate|discrimination|bias|prejudice)\b",
    r"\b(?:private|confidential|secret|classified)\b",
]

# validator.rs:792 — coherence connector lexicon.
CONNECTORS: list[str] = ["however", "therefore", "furthermore",
                         "additionally", "meanwhile", "consequently"]

# validator.rs:458-463 — (negative, positive) substring pairs.
CONTRADICTION_PAIRS: list[tuple[str, str]] = [
    ("not", "is"), ("never", "always"),
    ("none", "all"), ("impossible", "possible"),
]

# ValidationConfig::default() — validator.rs:84-99.
MIN_CONFIDENCE = 0.3
MAX_RESPONSE_LEN = 4096
MIN_RESPONSE_LEN = 10


def _words(col: Column) -> Column:
    return F.filter(F.split(col, " "), lambda x: x != "")


def _any_contains(s: Column, terms: list[str]) -> Column:
    return reduce(lambda a, b: a | b, [s.contains(t) for t in terms])


def validate_queries(
    queries: DataFrame,
    id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """validator.rs:295-366 → (query_id, is_valid, n_issues,
    validation_score).  is_valid is 0/1 int for cross-engine hashing."""
    q = F.col(query_col)
    ql = F.lower(q)
    i_empty = (F.trim(q) == "").cast("int")
    i_long = ((F.trim(q) != "") & (F.length(q) > 1000)).cast("int")
    i_safety = reduce(lambda a, b: a | b,
                      [ql.rlike(p) for p in SAFETY_PATTERNS]).cast("int")
    i_noalpha = (~q.rlike("[A-Za-z]")).cast("int")
    n_issues = i_empty + i_long + i_safety + i_noalpha
    score = F.when(i_empty == 1, 0.0).otherwise(
        1.0 - F.least(n_issues.cast("double") * 0.1, F.lit(0.8)))
    return queries.select(
        F.col(id_col).alias("query_id"),
        (1 - i_empty).alias("is_valid"),
        n_issues.alias("n_issues"),
        F.round(score, 6).alias("validation_score"),
    )


def validate_responses(
    responses: DataFrame,
    id_col: str = "response_id",
    query_col: str = "query",
    content_col: str = "content",
    confidence_col: str = "confidence",
    sources_col: str = "sources",
    n_subqueries_col: str = "n_subqueries",
) -> DataFrame:
    """validator.rs:369-523 → one row per response with the six
    QualityMetrics scores plus the appended-issue count, all 6 dp."""
    content = F.col(content_col)
    cl = F.lower(content)
    query = F.col(query_col)
    conf = F.col(confidence_col).cast("double")
    sources = F.col(sources_col)
    n_subq = F.col(n_subqueries_col).cast("int")

    # Sentence list with Rust split semantics (trailing empties kept).
    sents = F.split(cl, r"[.!?]", -1)
    n_sents = F.size(sents)

    # Coherence — validator.rs:781-814.
    conn_cnt = F.size(F.filter(sents, lambda s: _any_contains(s, CONNECTORS)))
    coherence = F.when(
        n_sents > 1,
        F.least(conn_cnt.cast("double") / n_sents, F.lit(1.0))
    ).otherwise(F.lit(1.0))

    # Relevance — Jaccard of word sets, validator.rs:847-884.
    qw = F.array_distinct(_words(F.lower(query)))
    aw = F.array_distinct(_words(cl))
    inter = F.size(F.array_intersect(qw, aw))
    union = F.size(qw) + F.size(aw) - inter
    relevance = F.when(union > 0,
                       inter.cast("double") / union).otherwise(F.lit(0.0))

    # Factual consistency — validator.rs:452-478.
    per_sent = lambda s: reduce(  # noqa: E731
        lambda a, b: a + b,
        [F.when(s.contains(neg) & s.contains(pos), 1).otherwise(0)
         for neg, pos in CONTRADICTION_PAIRS])
    contra = F.aggregate(F.transform(sents, per_sent), F.lit(0),
                         lambda acc, x: acc + x)
    consistency = 1.0 - F.least(
        contra.cast("double") / F.greatest(n_sents, F.lit(1)), F.lit(1.0))

    # Completeness metric — validator.rs:482-488.
    clen = F.length(content)
    len_score = F.when(clen > 100, 1.0).otherwise(clen / 100.0)
    nsrc = F.size(sources)
    src_score = F.when(nsrc > 2, 1.0).otherwise(nsrc / 2.0)
    subq_score = F.when(n_subq > 1, 1.0).otherwise(n_subq.cast("double"))
    completeness = (len_score + src_score + subq_score) / 3.0

    # Readability — validator.rs:492-505 (punctuation-CHAR denominator).
    wc = F.size(_words(content))
    punct = F.greatest(
        F.length(content) - F.length(F.translate(content, ".!?", "")),
        F.lit(1))
    avg_wps = wc.cast("double") / punct
    alpha = F.length(F.regexp_replace(content, "[^A-Za-z]", ""))
    avg_wl = alpha.cast("double") / F.greatest(wc, F.lit(1))
    readability = (F.when(avg_wps > 30.0, 0.5).otherwise(1.0)
                   + F.when(avg_wl > 8.0, 0.7).otherwise(1.0)) / 2.0

    # Source credibility — validator.rs:509-523.
    prefixes = F.size(F.array_distinct(
        F.transform(sources, lambda s: F.substring(s, 1, 10))))
    credibility = F.when(nsrc == 0, 0.0).otherwise(
        (F.least(nsrc / 5.0, F.lit(1.0)) + prefixes.cast("double") / nsrc)
        / 2.0)

    # Issues appended on check FAILURE — validator.rs:377-430.
    cov = F.array_distinct(
        F.filter(_words(F.lower(query)), lambda w: F.length(w) > 3))
    cov_rel = F.when(F.size(cov) == 0, 1.0).otherwise(
        F.size(F.array_intersect(cov, aw)).cast("double") / F.size(cov))
    i_short = (clen < MIN_RESPONSE_LEN).cast("int")
    i_long = (clen > MAX_RESPONSE_LEN).cast("int")
    i_conf = (conf < MIN_CONFIDENCE).cast("int")
    i_nosrc = (nsrc == 0).cast("int")
    i_cov = (cov_rel < 0.3).cast("int")
    i_coh = ((n_sents > 1) & (coherence < 0.3)).cast("int")
    i_rel = (relevance < 0.2).cast("int")
    i_cons = (consistency < 0.5).cast("int")
    i_safety = reduce(lambda a, b: a | b,
                      [cl.rlike(p) for p in SAFETY_PATTERNS]).cast("int")
    n_issues = (i_short + i_long + i_conf + i_nosrc + i_cov
                + i_coh + i_rel + i_cons + i_safety)

    return responses.select(
        F.col(id_col).alias("response_id"),
        F.round(coherence, 6).alias("coherence"),
        F.round(relevance, 6).alias("relevance"),
        F.round(consistency, 6).alias("consistency"),
        F.round(completeness, 6).alias("completeness"),
        F.round(readability, 6).alias("readability"),
        F.round(credibility, 6).alias("credibility"),
        n_issues.alias("n_issues"),
        (n_issues == 0).cast("int").alias("passed"),
    )


def validator_oracle_exprs() -> dict[str, str]:
    """DuckDB fragments generated from the SAME constants (single
    source of truth), over aliases `q` (lower query), `c` (content),
    `cl` (lower content), `conf`, `srcs`, `nsubq`.  string_split_regex
    keeps trailing empties exactly like the Rust split."""
    safety_cl = " or ".join(f"regexp_matches(cl, '{p}')"
                            for p in SAFETY_PATTERNS)
    safety_q = " or ".join(f"regexp_matches(q, '{p}')"
                           for p in SAFETY_PATTERNS)
    conn = " or ".join(f"contains(s, '{t}')" for t in CONNECTORS)
    contra = " + ".join(
        f"(case when contains(s, '{n}') and contains(s, '{p}') "
        f"then 1 else 0 end)" for n, p in CONTRADICTION_PAIRS)
    return {
        "sents": "string_split_regex(cl, '[.!?]')",
        "coherence": f"""case when len(sents) > 1 then
            least(len(list_filter(sents, s -> {conn}))::DOUBLE
                  / len(sents), 1.0) else 1.0 end""",
        "qw": "list_distinct(list_filter(string_split(q, ' '), "
              "x -> x <> ''))",
        "aw": "list_distinct(list_filter(string_split(cl, ' '), "
              "x -> x <> ''))",
        "relevance": """case when len(qw) + len(aw)
                - len(list_intersect(qw, aw)) > 0
            then len(list_intersect(qw, aw))::DOUBLE
                 / (len(qw) + len(aw) - len(list_intersect(qw, aw)))
            else 0.0 end""",
        "consistency": f"""1.0 - least(
            list_sum(list_transform(sents, s -> {contra}))::DOUBLE
            / greatest(len(sents), 1), 1.0)""",
        # DuckDB decimal-literal gotcha: 1.0 is DECIMAL, and int/DECIMAL
        # division stays DECIMAL — every branch/divisor is cast ::DOUBLE
        # so the arithmetic is bit-identical IEEE double on both engines.
        "completeness": """(
            (case when length(c) > 100 then 1.0::DOUBLE
                  else length(c) / 100.0::DOUBLE end)
            + (case when len(srcs) > 2 then 1.0::DOUBLE
                    else len(srcs) / 2.0::DOUBLE end)
            + (case when nsubq > 1 then 1.0::DOUBLE else nsubq::DOUBLE end)
            ) / 3.0::DOUBLE""",
        "readability": """(
            (case when (len(list_filter(string_split(c, ' '),
                                        x -> x <> '')))::DOUBLE
                 / greatest(length(c) - length(translate(c, '.!?', '')),
                            1) > 30.0 then 0.5::DOUBLE
               else 1.0::DOUBLE end)
            + (case when length(regexp_replace(c, '[^A-Za-z]', '', 'g'))
                         ::DOUBLE
                 / greatest(len(list_filter(string_split(c, ' '),
                                            x -> x <> '')), 1) > 8.0
               then 0.7::DOUBLE else 1.0::DOUBLE end)) / 2.0::DOUBLE""",
        "credibility": """case when len(srcs) = 0 then 0.0::DOUBLE else
            (least(len(srcs) / 5.0::DOUBLE, 1.0::DOUBLE)
             + len(list_distinct(list_transform(srcs, s -> s[1:10])))
               ::DOUBLE / len(srcs)) / 2.0::DOUBLE end""",
        "cov_rel": """case when len(list_distinct(list_filter(
                string_split(q, ' '), w -> length(w) > 3))) = 0 then 1.0
            else len(list_intersect(list_distinct(list_filter(
                     string_split(q, ' '), w -> length(w) > 3)), aw))
                 ::DOUBLE
                 / len(list_distinct(list_filter(string_split(q, ' '),
                                                 w -> length(w) > 3)))
            end""",
        "safety_cl": safety_cl,
        "safety_q": safety_q,
    }

"""PII scrubbing / redaction for training corpora.

Standard pre-training hygiene: replace emails, URLs, IPv4 addresses and
phone-like digit runs with typed sentinels and count what was removed.
Pure regexp_replace / regexp_extract_all chains — JVM-side, inside
whole-stage codegen, one projection over the scan (no shuffle, no
Python). Patterns deliberately avoid alternation and backreferences so
Java regex (leftmost-first, greedy) and RE2-style engines
(leftmost-longest) produce identical matches — the DuckDB oracle replays
the chain verbatim.

Redaction order matters and is fixed: URL → email → IPv4 → phone, each
stage matching against the previous stage's output (an email inside a
URL is gone with the URL; digits inside '<EMAIL>' can't trip the phone
pass). Counts are per stage, on that stage's input.

No reference analogue; part of the training-pipeline family the task
brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (kind, pattern, sentinel) — applied in order. No '|' alternation except
# the single optional char in https?; no lookaround; no backrefs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    ("phone", r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
)


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """→ (doc_id, text_clean, n_url, n_email, n_ipv4, n_phone).

    One narrow select per redaction stage (Catalyst collapses them into
    a single projection); each stage's count is evaluated on that
    stage's input text.
    """
    out = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(text_col).alias("_stage"))
    count_cols: list[str] = []
    for i, (kind, pat, sentinel) in enumerate(PII_PATTERNS):
        nxt = "text_clean" if i == len(PII_PATTERNS) - 1 else "_stage2"
        out = out.select(
            "doc_id", *count_cols,
            F.size(F.expr(f"regexp_extract_all(_stage, r'{pat}', 0)"))
            .cast("bigint").alias(f"n_{kind}"),
            F.regexp_replace(F.col("_stage"), pat, sentinel).alias(nxt),
        )
        if nxt != "text_clean":
            out = out.withColumnRenamed("_stage2", "_stage")
        count_cols.append(f"n_{kind}")
    return out.select("doc_id", "text_clean",
                      *[f"n_{k}" for k, _, _ in PII_PATTERNS])

"""Cross-engine deterministic hashing and tokenization expressions.

Everything here is a pure Catalyst column expression (JVM-side, inside
whole-stage codegen) chosen so an ANSI-SQL engine (the DuckDB oracle)
computes bit-identical values:

  h60(x)       = first 15 hex digits of md5(x) as a bigint (60 bits)
  shingles(x,k)= all k-char substrings (positional, with duplicates removed)
  tokens(x)    = lowercase alphanumeric word split

A 60-bit md5 prefix keeps us inside signed-int64 everywhere while giving
collision odds ~n²/2⁶⁰ — fine for dedup candidate generation at 10⁹ docs
per partition-group (verification re-checks real similarity anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def h60(col: Column | str) -> Column:
    """Deterministic 60-bit hash: bigint of md5 prefix (engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def norm_text(col: Column | str) -> Column:
    """Lowercase, non-alphanumerics → space, collapse+trim."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    out = F.regexp_replace(out, "[^a-z0-9]+", " ")
    return F.trim(out)


def tokens(col: Column | str) -> Column:
    """array<string> of normalized word tokens (may be empty)."""
    t = norm_text(col)
    return F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, " "))


def word_ngrams(toks: Column | str, n: int) -> Column:
    """Space-joined word n-grams of an ALREADY-MATERIALIZED token array.

    Shared by contamination and repetition stats so the two pitfalls
    live in one place: (1) `sequence(1, 0)` steps DOWN to [1, 0] in
    Spark, so <n-token docs must short-circuit to an empty array before
    indexing; (2) callers must project the token array first —
    tokenization inlined into the lambda re-evaluates per position
    (measured 30× slower at sf0.1).
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    return F.when(
        F.size(t) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(t, i + j)
                               for j in range(n)])))


def shingle_array(norm_col: Column | str, k: int = 5) -> Column:
    """Distinct k-char shingles of an ALREADY-NORMALIZED column.

    Callers must materialize `norm_text(...)` in a prior projection:
    referencing the normalization chain inside the transform lambda makes
    Catalyst re-evaluate the regexp per position (measured 5× the cost
    of the whole shingling step).
    """
    t = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: F.substring(t, i, k),
        )
    )


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct k-char shingles of raw text (normalizes inline).

    Prefer `select(norm_text(...).alias("nt"))` + `shingle_array("nt")`
    in hot paths — see shingle_array's CSE note.
    """
    return shingle_array(norm_text(col), k)

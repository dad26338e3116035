"""Text analysis operators for training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen-friendly, pushdown-safe):

  token_stats     — whitespace + word-regex token counts, char counts
  quality_scores  — length / punctuation / stopword / word-length signals
                    fused into a deterministic [0,1] quality score
  language_id     — marker-word n-gram heuristic over small per-language
                    lexicons (broadcast-joined)
  fingerprints    — winnowing document fingerprints: k-gram hashes, window
                    minimum over w consecutive positions (Schleimer et al.,
                    SIGMOD'03) — the standard near-dup/plagiarism sketch
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import h60, word_ngrams

# Small, fixed marker lexicons (top function words per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es": ("el", "la", "los", "y", "es", "en", "que", "una", "por", "con"),
}

STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "as", "at", "by", "be", "on",
                                  "or", "with", "this", "are", "from")

_TOKENIZE = ("filter(split(trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ')),"
             " ' '), x -> x != '')")

# GPT-2-style pre-tokenizer, restricted to the subset with identical
# semantics under Java regex (Spark) and RE2 (DuckDB): contractions,
# space-prefixed letter/digit runs, punctuation runs, residual
# whitespace.  Counting its matches is the standard cheap "how many BPE
# tokens will this cost" estimate (within a few % of a real BPE for
# English web text — each match maps to ≥1 merge-table token).
BPEISH_PATTERN = (r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                  r"| ?[^A-Za-z0-9\s]+|\s+")


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                keep: tuple[str, ...] = ()) -> DataFrame:
    """→ (doc_id, n_chars, n_ws_tokens, n_word_tokens, n_distinct_tokens,
    n_bpeish_tokens) — whitespace, word-regex, and BPE-ish-pretokenizer
    counts (the three token-counting conventions a curation pipeline
    quotes budgets in).

    `keep` passes input columns through unchanged, so projection-only
    stats chain scan-side instead of join-fusing two scans of the same
    table (see stages/curate.py) — a pure projection never needs a join.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(F.split(F.trim(text_col), r"\s+")).cast("bigint")
        .alias("n_ws_tokens"),
        F.expr(_TOKENIZE.format(c=text_col)).alias("toks"),
        F.regexp_count(F.col(text_col), F.lit(BPEISH_PATTERN))
        .cast("bigint").alias("n_bpeish_tokens"),
        *keep,
    )
    return base.select(
        "doc_id", "n_chars", "n_ws_tokens",
        F.size("toks").cast("bigint").alias("n_word_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint")
        .alias("n_distinct_tokens"),
        F.col("n_bpeish_tokens"),
        *keep,
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   keep: tuple[str, ...] = ()) -> DataFrame:
    """→ (doc_id, punct_ratio, stopword_ratio, mean_word_len, quality).

    quality = mean of three bounded signals: length band, stopword presence
    band, and punctuation sanity — deterministic, rounded to 6 dp.
    `keep` passes input columns through (same rationale as token_stats);
    kept names must not collide with the internal n_chars/n_punct/n_tok.
    """
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_TOKENIZE.format(c=text_col)).alias("toks"),
        F.length(text_col).alias("n_chars"),
        (F.length(text_col)
         - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")))
        .alias("n_punct"),
        *keep,
    )
    toks = F.col("toks")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))

    punct_ratio = F.round(F.col("n_punct") / F.greatest("n_chars", F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t))
        / F.greatest(n_tok, F.lit(1)), 6)

    m = base.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_wl.alias("mean_word_len"),
        n_tok.alias("n_tok"),
        *keep,
    )
    len_signal = F.when((F.col("n_tok") >= 10)
                        & (F.col("n_tok") <= 100000), 1.0).otherwise(0.0)
    stop_signal = F.when((F.col("stopword_ratio") >= 0.05)
                         & (F.col("stopword_ratio") <= 0.6), 1.0).otherwise(0.0)
    punct_signal = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    return m.select(
        "doc_id", "punct_ratio", "stopword_ratio", "mean_word_len",
        F.round((len_signal + stop_signal + punct_signal) / 3.0, 6)
        .alias("quality"),
        *keep,
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """→ (doc_id, lang, score): argmax marker-hit count per language.

    Ties break by language code ascending; docs with zero marker hits get
    lang='und', score=0.
    """
    spark = docs.sparkSession
    lex = spark.createDataFrame(
        [(lang, w) for lang, words in sorted(LANG_MARKERS.items())
         for w in words],
        "cand_lang string, marker string")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_TOKENIZE.format(c=text_col))).alias("tok"),
    )
    hits = (
        toks.join(F.broadcast(lex), toks["tok"] == lex["marker"])
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("cand_lang").asc())
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("lang"),
                F.col("hits").cast("bigint").alias("score"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang", F.lit("und")).alias("lang"),
            F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
        )
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing: → (doc_id, n_fingerprints, min_fingerprint).

    k-gram hashes over the normalized text; a fingerprint is the minimum
    hash in each window of w consecutive k-grams; the distinct set
    identifies a document robustly under edits.
    """
    # materialize the normalized text before the per-position transform
    # (inline, the regexp chain re-evaluates per position — hashing.py)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   "[^a-z0-9]+", " "))
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("nt"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.length("nt") - (k - 1), F.lit(1))),
                    lambda i: F.substring(F.col("nt"), i, k),
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", "pos", h60("gram").alias("gh"))
    )
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(0, w - 1))
    fp = grams.select("doc_id", F.min("gh").over(win).alias("fp")).distinct()
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


def lm_perplexity(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", add_k: float = 1.0) -> DataFrame:
    """Bigram-LM perplexity quality proxy (the CCNet signal, Wenzek et
    al. 2020, with an in-corpus add-k bigram LM standing in for the
    external KenLM — no model files, fully engine-portable).

    → (doc_id, n_bigrams, avg_logprob, perplexity): an add-k-smoothed
    bigram LM is trained on the WHOLE input corpus, then every document
    is scored under it —

        P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)

    where c(w1·) is w1's count as a bigram prefix and V the corpus
    vocabulary size.  avg_logprob = mean log2 P over the doc's bigrams;
    perplexity = 2^(-avg_logprob).  Boilerplate/templated text scores
    low perplexity, lexical noise scores high — both tails are what a
    curation pipeline filters.  Docs with < 2 tokens return n_bigrams=0
    and null scores.  Floats rounded 6dp at the output boundary.

    Scale shape: one explode to bigrams, two count aggregations (bigram
    table ~ distinct-bigram sized, prefix table ~ vocab sized), then two
    joins back on those same keys.  Stopword bigrams make the join keys
    Zipf-skewed — AQE skew-join splits them; the count tables broadcast
    when small.  Nothing is quadratic and no per-doc state exceeds the
    doc itself.

    Reference scope note: graphrag-rs has no corpus LM scoring; this is
    part of the engine-added training-data curation family (COVERAGE.md
    "curation").
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_TOKENIZE.format(c=text_col)).alias("toks"))
    # vocabulary size over ALL tokens (not just bigram prefixes), the
    # standard smoothing denominator
    vocab = (toks.select(F.explode("toks").alias("w"))
             .agg(F.countDistinct("w").cast("bigint").alias("v_size")))
    bg = (
        toks.select("doc_id",
                    F.explode(word_ngrams("toks", 2)).alias("bg"))
        .withColumn("w1", F.split("bg", " ")[0]))
    c12 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(c12, "bg").join(c1, "w1")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log2((F.col("c12") + F.lit(add_k))
                   / (F.col("c1") + F.lit(add_k) * F.col("v_size")))
            .alias("lp")))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.avg("lp").alias("_avg_lp"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("int")
            .alias("n_bigrams"),
            F.round("_avg_lp", 6).alias("avg_logprob"),
            F.round(F.pow(F.lit(2.0), -F.col("_avg_lp")), 6)
            .alias("perplexity")))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1):

    → (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       dup_word_frac, top_bigram_char_frac), all fractions rounded 6dp.

      dup_line_frac        fraction of lines occurring more than once
      dup_line_char_frac   fraction of line characters inside such lines
      dup_word_frac        1 - distinct/total word tokens
      top_bigram_char_frac fraction of token characters covered by the
                           most frequent word 2-gram

    Shape at scale: two explodes (lines, bigrams) each aggregated on a
    composite key — balanced shuffles, no per-doc quadratic work, so a
    pathological 10^6-line document costs O(L log L) across the cluster
    rather than O(L^2) on one task. High-duplication training shards are
    exactly where this runs, so that bound matters.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.transform(F.split(F.col(text_col), "\n"),
                             lambda s: F.trim(s)),
                 lambda s: s != "").alias("lines"),
        F.expr(_TOKENIZE.format(c=text_col)).alias("toks"),
    )

    # --- line duplication: explode -> count per (doc, line) -> fold
    line_counts = (
        base.select("doc_id", F.explode_outer("lines").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # explode_outer emits one null-line row for empty docs: every sum
    # below must gate on line IS NOT NULL so such docs count 0 lines.
    has_line = F.col("line").isNotNull()
    is_dup = has_line & (F.col("cnt") > 1)
    line_stats = line_counts.groupBy("doc_id").agg(
        F.sum(F.when(has_line, F.col("cnt")).otherwise(0)).alias("n_lines"),
        F.sum(F.when(is_dup, F.col("cnt")).otherwise(0)).alias("dup_lines"),
        F.sum(F.when(has_line, F.col("cnt") * F.length("line")).otherwise(0))
        .alias("line_chars"),
        F.sum(F.when(is_dup, F.col("cnt") * F.length("line")).otherwise(0))
        .alias("dup_line_chars"),
    )

    # --- word-token duplication + top-bigram coverage
    word_stats = base.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_distinct_toks"),
        F.aggregate("toks", F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)).alias("tok_chars"),
        word_ngrams("toks", 2).alias("bigrams"),
    )
    bigram_counts = (
        word_stats.select("doc_id", F.explode_outer("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Gopher A1.1: chars covered by the MOST FREQUENT bigram — pick by
    # occurrence count (ties → longer bigram; equal (cnt, len) ties have
    # equal coverage, so the product is deterministic either way), then
    # coverage = cnt * (len(bg) - 1): the joining space in the concat is
    # not a source character.  max over cnt*(len-1) directly would let a
    # long rare bigram outscore the most frequent one.
    top_bigram = bigram_counts.groupBy("doc_id").agg(
        F.max(F.when(F.col("bg").isNotNull(),
                     F.struct(F.col("cnt").alias("cnt"),
                              (F.length("bg") - 1).alias("bchars"))))
        .alias("_top"))
    top_bigram = top_bigram.select(
        "doc_id",
        F.coalesce(F.col("_top.cnt") * F.col("_top.bchars"), F.lit(0))
        .alias("top_bigram_chars"))

    out = (
        word_stats.select("doc_id", "n_toks", "n_distinct_toks", "tok_chars")
        .join(line_stats, "doc_id", "left")
        .join(top_bigram, "doc_id", "left")
    )
    nz = lambda c: F.greatest(c, F.lit(1))
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint")
        .alias("n_lines"),
        F.round(F.coalesce(F.col("dup_lines"), F.lit(0))
                / nz(F.col("n_lines")), 6).alias("dup_line_frac"),
        F.round(F.coalesce(F.col("dup_line_chars"), F.lit(0))
                / nz(F.col("line_chars")), 6).alias("dup_line_char_frac"),
        F.round((F.col("n_toks") - F.col("n_distinct_toks"))
                / nz(F.col("n_toks")), 6).alias("dup_word_frac"),
        F.round(F.coalesce(F.col("top_bigram_chars"), F.lit(0))
                / nz(F.col("tok_chars")), 6).alias("top_bigram_char_frac"),
    )

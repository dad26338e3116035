"""Distributed BPE tokenizer training and encoding (Sennrich et al. 2016).

Tokenizer training is a standard large-corpus pipeline job: count words
once over the full corpus, then learn a merge table over the (small)
distinct-word frequency vocabulary.  The expensive part — the corpus
scan — happens exactly once; every merge iteration runs over the vocab
frame, whose size is bounded by the language (millions of rows), not the
corpus (billions), so training cost is independent of corpus size after
the first aggregation.  That is the property that makes this run on
100 TB: iterate on KBs-to-MBs, scan TBs once.

  word_freqs  — one corpus scan → (word, freq), normalized to [a-z0-9]
                words (the same convention as textstats._TOKENIZE)
  bpe_train   — num_merges iterations of: count adjacent symbol pairs
                (weighted by word freq) → pick argmax (deterministic
                tie-break) → apply the merge.  One tiny driver scalar
                per merge (the argmax), like PageRank's per-iteration
                convergence check; everything else stays JVM-side.
  bpe_encode  — apply a learned merge table to a corpus: merges run on
                the DISTINCT-word vocab only, then docs explode to words
                and broadcast-join the vocab→tokens dictionary — the
                corpus itself is never touched by the merge rewriting.

Merge application is EXACT greedy left-to-right BPE, pure JVM: symbols
are joined with a '\\x1f' separator and each merge (a, b) is one
`regexp_replace` of `(?<=\\x1f)a\\x1fb(?=\\x1f)` → `ab`.  The lookarounds
assert whole-symbol boundaries without consuming them, so Java's
left-to-right non-overlapping scan reproduces the reference BPE
segmentation exactly (e.g. 'aaaaa' + merge (a,a) → aa, aa, a).  Symbols
stay in [a-z0-9]+ by construction (word normalization), so patterns
need no escaping.

Correctness evidence: `bpe_pair_counts`, `bpe_merges` AND `bpe_encode`
are all DuckDB-value-verified — the training loop unrolls into
per-merge CTE steps, and the greedy rewrite replays without lookarounds
via a double-separator string encoding where plain replace() is exact
greedy BPE (each match consumes one separator from each pad-pair,
restoring the boundary invariant; see the oracle in __spark_entry__).
The loop and encoding are additionally pinned in pytest against an
independent pure-Python BPE implementation.

Reference parity note: graphrag-rs has no tokenizer-training subsystem;
this is a training-pipeline extension mandated by the task brief
alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan → (word, freq) over normalized [a-z0-9] words."""
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                                "[^a-z0-9]+", " ")), " "),
                lambda x: x != "",
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _sym_col(word) -> F.Column:
    """word → '\\x1fc\\x1fh\\x1fa\\x1fr\\x1f' (chars joined + padded)."""
    chars = F.split(word, "(?!^)(?=.)")  # split into single chars
    return F.concat(F.lit(SEP), F.array_join(chars, SEP), F.lit(SEP))


def _apply_merge(sym: F.Column, left: str, right: str) -> F.Column:
    """One exact greedy left-to-right BPE merge on a padded symbol string."""
    return F.regexp_replace(
        sym, f"(?<={SEP}){left}{SEP}{right}(?={SEP})", left + right)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(word-sym, freq) vocab → (left, right, pair_freq) adjacent counts."""
    syms = vocab.select(
        F.split(F.expr("substring(sym, 2, length(sym) - 2)"), SEP)
        .alias("symbols"),
        "freq",
    ).where(F.size("symbols") >= 2)
    pairs = syms.select(
        F.explode(
            F.arrays_zip(
                F.slice("symbols", 1, F.size("symbols") - 1).alias("left"),
                F.slice("symbols", 2, F.size("symbols") - 1).alias("right"),
            )
        ).alias("p"),
        "freq",
    )
    return (
        pairs.groupBy(F.col("p.left").alias("left"),
                      F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-iteration adjacent-character pair counts (the counting
    kernel of BPE training) — SQL-expressible, DuckDB-verified."""
    vocab = word_freqs(docs, text_col).select(
        _sym_col(F.col("word")).alias("sym"), "freq")
    return _pair_counts(vocab)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 64,
    min_pair_freq: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 16,
) -> list[tuple[str, str, int]]:
    """Learn a BPE merge table → [(left, right, pair_freq)] in merge order.

    Ties on pair_freq break lexicographically on (left, right) so the
    table is deterministic across partitionings and engines.  The vocab
    frame is localCheckpointed every `checkpoint_every` merges to keep
    the chained-regexp plan (and its lineage) bounded.
    """
    vocab = (
        word_freqs(docs, text_col)
        .select(_sym_col(F.col("word")).alias("sym"), "freq")
        .localCheckpoint(eager=True)  # corpus scanned exactly once
    )
    merges: list[tuple[str, str, int]] = []
    for i in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_freq"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_freq"] < min_pair_freq:
            break
        left, right, freq = best[0]["left"], best[0]["right"], \
            int(best[0]["pair_freq"])
        merges.append((left, right, freq))
        vocab = vocab.select(
            _apply_merge(F.col("sym"), left, right).alias("sym"), "freq")
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def merges_frame(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Merge table as a DataFrame (merge_idx, left, right, pair_freq)."""
    return spark.createDataFrame(
        [(i, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "merge_idx int, left string, right string, pair_freq bigint",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 16,
) -> DataFrame:
    """→ (doc_id, n_words, n_bpe_tokens, tokens) using a learned table.

    Merges rewrite only the DISTINCT-word dictionary (vocab-sized work);
    the corpus maps through it with one explode + broadcast join + one
    groupBy(doc_id) reassembly shuffle.  `tokens` is the in-order BPE
    token sequence of the document's normalized words.
    """
    norm_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                                "[^a-z0-9]+", " ")), " "),
                lambda x: x != "",
            )
        ).alias("pos", "word"),
    )
    vocab = norm_words.select("word").distinct() \
        .withColumn("sym", _sym_col(F.col("word")))
    for i, (left, right, _) in enumerate(merges):
        vocab = vocab.withColumn(
            "sym", _apply_merge(F.col("sym"), left, right))
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    vocab = vocab.select(
        "word",
        F.split(F.expr("substring(sym, 2, length(sym) - 2)"), SEP)
        .alias("word_tokens"),
    )
    # no broadcast hint: the word→tokens dictionary is language-bounded
    # but can reach millions of rows × a token array each — a forced
    # broadcast (which AQE cannot undo) would OOM at that size, while
    # AQE still broadcasts it automatically whenever it is small
    joined = norm_words.join(vocab, "word")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct("pos", "word_tokens"))),
                    lambda s: s["word_tokens"],
                )
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .select("doc_id", "n_words",
                F.size("tokens").cast("bigint").alias("n_bpe_tokens"),
                "tokens")
    )

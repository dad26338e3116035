"""E11 — custom dictionary/rule NER (reference nlp/custom_ner.rs:104-384,
known-locations contains-scan entity/mod.rs:583-614).

The reference scans each text against a registered dictionary of typed
phrases (plus regex rules).  The Spark-scale shape is NOT a per-row scan
of every dictionary entry: tokenize once, generate 1..max_words-grams
with positions, and broadcast-join the (tiny) dictionary against the
n-gram stream.  Work is O(tokens × max_words) per document regardless of
dictionary size, fully JVM-side (no Python UDF), and the join is a
broadcast hash join — no shuffle of the text side beyond the final
per-document aggregation, which is co-partitioned by the group key.

Regex rules ride the same scan as an `rlike` filter applied to the
n-gram stream (RuleType::Regex in the reference), so dictionary phrases
and regex rules share one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NORM = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' '))"


def _ngram_stream(docs: DataFrame, id_col: str, text_col: str,
                  max_words: int) -> DataFrame:
    """(id, pos, n, gram) for every 1..max_words-gram, 0-based pos."""
    toks = F.expr(
        "filter(split(" + _NORM.format(c=text_col) + ", ' '), x -> x <> '')")
    return (
        docs.select(F.col(id_col).alias("_id"), toks.alias("toks"))
        .select(
            "_id",
            # filter the n range FIRST: sequence(0, size-n) with size<n
            # would flip into a descending sequence (Spark defaults step
            # to -1 when start>stop) and emit pos -1 garbage
            F.explode(F.flatten(F.expr(f"""
                transform(filter(sequence(1, {max_words}),
                                 n -> size(toks) >= n), n ->
                    transform(sequence(0, size(toks) - n), i ->
                        struct(i as pos, n as n,
                               array_join(slice(toks, i + 1, n), ' ') as gram)))
            """))).alias("g"))
        .select("_id", F.col("g.pos").alias("pos"),
                F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    )


def dictionary_ner(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 3,
) -> DataFrame:
    """→ (id_col, name, entity_type, n_mentions, first_pos).

    `lexicon` is a small (phrase, entity_type) DataFrame — normalized the
    same way as the text (lowercase, non-alnum collapsed).  Every n-gram
    occurrence counts (overlaps included), matching the reference's
    find-all contains scan; `first_pos` is the 0-based token offset of
    the earliest match.
    """
    lex = F.broadcast(lexicon.select(
        F.expr(_NORM.format(c="phrase")).alias("gram"),
        F.col("entity_type")))
    # fail fast on phrases the n-gram stream can never produce — a
    # lexicon entry longer than max_words would otherwise just silently
    # never match (one tiny job over the dictionary-sized dim)
    longest = lex.agg(F.max(F.size(F.split("gram", " ")))).first()[0]
    if longest is not None and longest > max_words:
        raise ValueError(
            f"lexicon contains a {longest}-word phrase but max_words="
            f"{max_words}; raise max_words so every phrase can match")
    grams = _ngram_stream(docs, id_col, text_col, max_words)
    return (
        grams.join(lex, "gram")
        .repartition("_id")
        .groupBy(F.col("_id").alias(id_col),
                 F.col("gram").alias("name"),
                 "entity_type")
        .agg(F.count("*").alias("n_mentions"),
             F.min("pos").alias("first_pos"))
    )


def regex_ner(
    docs: DataFrame,
    rules: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 3,
) -> DataFrame:
    """Regex rules over the same n-gram stream: rules is a list of
    (java_regex_pattern, entity_type); an n-gram matching the pattern in
    full becomes a typed mention.  → same schema as dictionary_ner."""
    grams = _ngram_stream(docs, id_col, text_col, max_words)
    matched = None
    for pattern, etype in rules:
        m = grams.filter(F.col("gram").rlike("^(?:" + pattern + ")$")) \
                 .withColumn("entity_type", F.lit(etype))
        matched = m if matched is None else matched.unionByName(m)
    if matched is None:
        return grams.limit(0).select(
            F.col("_id").alias(id_col), F.col("gram").alias("name"),
            F.lit("").alias("entity_type"),
            F.lit(0).cast("long").alias("n_mentions"),
            F.lit(0).cast("int").alias("first_pos"))
    return (
        matched.repartition("_id")
        .groupBy(F.col("_id").alias(id_col),
                 F.col("gram").alias("name"), "entity_type")
        .agg(F.count("*").alias("n_mentions"),
             F.min("pos").alias("first_pos"))
    )

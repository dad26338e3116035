"""Heuristic syntax analysis (nlp/syntax_analyzer.rs) as batch operators.

Quirk-for-quirk port of the reference's rule-based POS tagger,
lemmatizer, noun-phrase chunker, and dependency extractor — reshaped
from per-string driver calls into corpus-wide DataFrame passes:
tokenization is one regexp_extract_all + posexplode, tagging is a
broadcast join against the ~170-word lexicon plus a when-chain of
suffix rules (all JVM codegen), noun phrases are a gaps-and-islands
window, dependencies are per-document window aggregates.  Zero Python
in any of it; each is 1-2 shuffles keyed by doc_id regardless of corpus
size.

Rule fidelity (syntax_analyzer.rs:194-580):
- tokenize: alnum/'/- runs are words, every other non-space char is its
  own token (:194-222).  Token positions here are ORDINALS, not char
  offsets (documented divergence — offsets don't survive distribution
  and nothing downstream uses them).
- tag_word cascade (:245-318): punct → number → dictionaries in the
  reference's exact lookup order (DT, PRP, IN, CC, RB, VB, JJ, NN —
  first hit wins, so "what"→DT, "for"→IN, "so"→CC, "work"→VB) →
  capitalized ⇒ NNP → suffix rules (ing⇒VBG, ed⇒VBD, s∧¬ss⇒NNS,
  ive/ous/ful⇒JJ, ly⇒RB) → default NN.  Tags are Penn strings
  (penn_tag(), :58-78).
- lemmatize (:318-353): NNS ies⇒y / strip-s; VBD strip-ed/-s; VBG
  strip-ing; everything else lowercases (so "running"⇒"runn", the
  reference's own golden quirk).
- noun phrases (:442-499): maximal runs of DT/JJ/NN/NNS/NNP tokens;
  head = LAST noun-ish position in the run, 0 if the run has no noun
  (the reference emits determiner-only runs — preserved).
- dependencies (:354-439): root = first VB/VBD token (index 0 if no
  verb — preserved quirk, the "object" scan then keys off position 0);
  subject = first NN/NNP/PRP before root; dobj = first NN/NNP after;
  every JJ/DT attaches to the NEXT NN/NNP; every RB attaches to the
  first verb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_RX = r"[A-Za-z0-9'-]+|[^A-Za-z0-9'\s-]"
PUNCT_RX = r"^[!-/:-@\[-`{-~]+$"     # the 32 ASCII punctuation chars
NUM_RX = r"^[0-9]+$"
UPPER_RX = r"^[A-Z]"

_DICTS = [
    ("DT", ["the", "a", "an", "this", "that", "these", "those", "my",
            "your", "his", "her", "its", "our", "their", "all", "both",
            "each", "every", "some", "any", "no", "another", "such",
            "what", "which"]),
    ("PRP", ["i", "you", "he", "she", "it", "we", "they", "me", "him",
             "her", "us", "them", "who", "whom", "what", "which", "this",
             "that"]),
    ("IN", ["of", "in", "to", "for", "with", "on", "at", "from", "by",
            "about", "into", "through", "during", "before", "after",
            "above", "below", "between", "under", "since", "without",
            "within", "along", "among", "across"]),
    ("CC", ["and", "or", "but", "nor", "yet", "so", "for", "because",
            "although", "though", "while", "if", "unless", "until",
            "when", "where"]),
    ("RB", ["not", "so", "out", "up", "now", "only", "just", "more",
            "also", "very", "well", "back", "there", "even", "still",
            "too", "here", "then", "always", "never", "often", "quite",
            "really", "almost", "again"]),
    ("VB", ["be", "have", "do", "say", "get", "make", "go", "know",
            "take", "see", "come", "think", "look", "want", "give",
            "use", "find", "tell", "ask", "work", "seem", "feel", "try",
            "leave", "call"]),
    ("JJ", ["good", "new", "first", "last", "long", "great", "little",
            "own", "other", "old", "right", "big", "high", "different",
            "small", "large", "next", "early", "young", "important",
            "few", "public", "bad", "same", "able"]),
    ("NN", ["time", "person", "year", "way", "day", "thing", "man",
            "world", "life", "hand", "part", "child", "eye", "woman",
            "place", "work", "week", "case", "point", "government",
            "company", "number", "group", "problem", "fact"]),
]

# first-wins merge in the reference's lookup order
LEXICON: dict[str, str] = {}
for _tag, _words in _DICTS:
    for _w in _words:
        LEXICON.setdefault(_w, _tag)

NOUNISH = ("NN", "NNS", "NNP", "NNPS")
NP_TAGS = ("DT", "JJ") + NOUNISH


def pos_tag(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """→ (doc_id, token_idx, token, pos, lemma), one row per token."""
    spark = docs.sparkSession
    lex = spark.createDataFrame(sorted(LEXICON.items()),
                                "_lw string, _ltag string")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.regexp_extract_all(F.col(text_col),
                                          F.lit(WORD_RX), 0))
        .alias("token_idx", "token"))
    lo = F.lower(F.col("token"))
    tagged = (toks.withColumn("_lw", lo)
              .join(F.broadcast(lex), "_lw", "left"))
    pos = (F.when(F.col("token").rlike(PUNCT_RX), ".")
           .when(F.col("token").rlike(NUM_RX), "CD")
           .when(F.col("_ltag").isNotNull(), F.col("_ltag"))
           .when(F.col("token").rlike(UPPER_RX), "NNP")
           .when(lo.endswith("ing"), "VBG")
           .when(lo.endswith("ed"), "VBD")
           .when(lo.endswith("s") & ~lo.endswith("ss"), "NNS")
           .when(lo.endswith("ive") | lo.endswith("ous")
                 | lo.endswith("ful"), "JJ")
           .when(lo.endswith("ly"), "RB")
           .otherwise("NN"))
    tagged = tagged.withColumn("pos", pos)
    l = F.lower(F.col("token"))
    drop = lambda k: F.substring(l, F.lit(1), F.length(l) - k)  # noqa: E731
    lemma = (
        F.when(F.col("pos") == "NNS",
               F.when(l.endswith("ies"), F.concat(drop(3), F.lit("y")))
               .when(l.endswith("s") & ~l.endswith("ss"), drop(1))
               .otherwise(l))
        .when(F.col("pos").isin("VBD", "VBZ"),
              F.when(l.endswith("ed"), drop(2))
              .when(l.endswith("s"), drop(1)).otherwise(l))
        .when(F.col("pos") == "VBG",
              F.when(l.endswith("ing"), drop(3)).otherwise(l))
        .otherwise(l))
    return tagged.select("doc_id", "token_idx", "token", "pos",
                         lemma.alias("lemma"))


def noun_phrases(tagged: DataFrame) -> DataFrame:
    """→ (doc_id, start_idx, n_tokens, head_idx, text): maximal runs of
    NP_TAGS tokens (gaps-and-islands); head_idx is the last noun-ish
    offset within the run, 0 when the run holds no noun."""
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    runs = (tagged.filter(F.col("pos").isin(*NP_TAGS))
            .withColumn("_seg", F.col("token_idx")
                        - F.row_number().over(w)))
    return (runs.groupBy("doc_id", "_seg")
            .agg(F.min("token_idx").alias("start_idx"),
                 F.count(F.lit(1)).cast("int").alias("n_tokens"),
                 (F.coalesce(
                     F.max(F.when(F.col("pos").isin(*NOUNISH),
                                  F.col("token_idx"))),
                     F.min("token_idx")) - F.min("token_idx"))
                 .cast("int").alias("head_idx"),
                 F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("token_idx", "token"))),
                         lambda x: x.token), " ").alias("text"))
            .drop("_seg"))


def dependencies(tagged: DataFrame) -> DataFrame:
    """→ (doc_id, head_idx, dep_idx, relation): the reference's
    simplified grammar (subject / dobj / modifier / determiner)."""
    from pyspark.sql import Window
    wdoc = Window.partitionBy("doc_id")
    wnext = (Window.partitionBy("doc_id").orderBy("token_idx")
             .rowsBetween(1, Window.unboundedFollowing))
    verb_idx = F.min(F.when(F.col("pos").isin("VB", "VBD", "VBZ"),
                            F.col("token_idx"))).over(wdoc)
    t = (tagged
         .withColumn("_verb", verb_idx)
         .withColumn("_root", F.coalesce(F.col("_verb"), F.lit(0)))
         .withColumn("_next_noun",
                     F.min(F.when(F.col("pos").isin("NN", "NNP"),
                                  F.col("token_idx"))).over(wnext)))
    subj = (t.filter((F.col("token_idx") < F.col("_root"))
                     & F.col("pos").isin("NN", "NNP", "PRP"))
            .groupBy("doc_id")
            .agg(F.min(F.struct("token_idx", "_root")).alias("_s"))
            .select("doc_id", F.col("_s._root").alias("head_idx"),
                    F.col("_s.token_idx").alias("dep_idx"),
                    F.lit("subject").alias("relation")))
    dobj = (t.filter((F.col("token_idx") > F.col("_root"))
                     & F.col("pos").isin("NN", "NNP"))
            .groupBy("doc_id")
            .agg(F.min(F.struct("token_idx", "_root")).alias("_o"))
            .select("doc_id", F.col("_o._root").alias("head_idx"),
                    F.col("_o.token_idx").alias("dep_idx"),
                    F.lit("dobj").alias("relation")))
    adj_mod = (t.filter((F.col("pos") == "JJ")
                        & F.col("_next_noun").isNotNull())
               .select("doc_id", F.col("_next_noun").alias("head_idx"),
                       F.col("token_idx").alias("dep_idx"),
                       F.lit("modifier").alias("relation")))
    adv_mod = (t.filter((F.col("pos") == "RB")
                        & F.col("_verb").isNotNull())
               .select("doc_id", F.col("_verb").alias("head_idx"),
                       F.col("token_idx").alias("dep_idx"),
                       F.lit("modifier").alias("relation")))
    det = (t.filter((F.col("pos") == "DT")
                    & F.col("_next_noun").isNotNull())
           .select("doc_id", F.col("_next_noun").alias("head_idx"),
                   F.col("token_idx").alias("dep_idx"),
                   F.lit("determiner").alias("relation")))
    return subj.unionByName(dobj).unionByName(adj_mod) \
        .unionByName(adv_mod).unionByName(det)

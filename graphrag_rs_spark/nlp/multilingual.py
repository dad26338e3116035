"""Trigram-LM language detection (nlp/multilingual.rs) as a batch pass.

Quirk-for-quirk port of the reference's LanguageDetector: five fixed
character-trigram models trained on hardcoded sentences
(multilingual.rs:200-235), scored as mean log-probability with
add-one-style smoothing (:162-188), keyword boosts added AFTER scoring
(:329-365), script-range short-circuits for CJK/Arabic/Cyrillic
(:387-437), and the reference's own confidence quirk — (max-min)/range
is ALWAYS 1.0 when any two scores differ, 0.5 otherwise (:314-320).

Batch/scale shape: the model is ~600 (lang, trigram) rows broadcast to
every executor; a document's score is one explode (its char trigrams) →
broadcast join → per-(doc, lang) sum.  Everything is exact-integer
arithmetic at query time: each trigram's ln(freq/total) is precomputed
HERE in Python as a micro-unit BIGINT literal (1e-6), so neither engine
evaluates ln() — Java's Math.log and C libm can differ by 1 ulp, which
would break cross-engine hashing; summing literal integers cannot.

Documented divergences: f64 instead of f32; ties break (score desc,
lang asc) where the reference sorts a HashMap nondeterministically;
scores rounded to 6 dp before ranking (repo invariant).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

TRAINING: dict[str, list[str]] = {
    "english": ["the quick brown fox jumps over the lazy dog",
                "this is a test of the english language"],
    "spanish": ["el rápido zorro marrón salta sobre el perro perezoso",
                "esta es una prueba del idioma español",
                "esto es texto en español",
                "esto es una prueba"],
    "french": ["le renard brun rapide saute par-dessus le chien paresseux",
               "ceci est un test de la langue française"],
    "german": ["der schnelle braune fuchs springt über den faulen hund",
               "dies ist ein test der deutschen sprache"],
    "portuguese": ["a rápida raposa marrom pula sobre o cão preguiçoso",
                   "este é um teste da língua portuguesa"],
}

KEYWORD_BOOSTS: list[tuple[str, str, float]] = (
    [(w, "spanish", 0.5) for w in
     ("esto", "es", "texto", "espanol", "español", "una", "prueba")]
    + [(w, "english", 0.2) for w in ("this", "is", "text", "english")]
    + [(w, "french", 0.4) for w in
       ("ceci", "est", "texte", "francais", "français")]
    + [(w, "german", 0.3) for w in ("dies", "ist", "dieser", "deutsch")]
    + [(w, "portuguese", 0.3) for w in
       ("este", "um", "portugues", "português")])

ACCENT_SRC = "áàâäãéèêëíìîïóòôöõúùûüñç"
ACCENT_DST = "aaaaaeeeeiiiiooooouuuunc"

# (name, char-class, min share; share=0 means "any occurrence") in the
# reference's check order — Chinese before Japanese matters
SCRIPTS = [
    ("chinese", "一-鿿", 0.3, 0.9),
    ("japanese", "぀-ゟ゠-ヿ", 0.0, 0.9),
    ("korean", "가-힯", 0.3, 0.95),
    ("arabic", "؀-ۿ", 0.3, 0.95),
    ("russian", "Ѐ-ӿ", 0.3, 0.9),
]


def _build_model() -> tuple[list[tuple[str, str, int]],
                            list[tuple[str, int]]]:
    """→ ([(lang, trigram, contrib_micro)], [(lang, default_micro)]):
    ln(freq/total) and the smoothing ln(1/(total+1)) per language,
    precomputed as exact micro-unit integers."""
    rows, defaults = [], []
    for lang, texts in sorted(TRAINING.items()):
        counts: dict[str, int] = {}
        total = 0
        for t in texts:
            chars = list(t.lower())
            for i in range(len(chars) - 2):
                g = "".join(chars[i:i + 3])
                counts[g] = counts.get(g, 0) + 1
                total += 1
        for g, c in sorted(counts.items()):
            rows.append((lang, g, round(math.log(c / total) * 1e6)))
        defaults.append((lang, round(math.log(1.0 / (total + 1)) * 1e6)))
    return rows, defaults


MODEL_ROWS, MODEL_DEFAULTS = _build_model()
LANGS = [lang for lang, _ in MODEL_DEFAULTS]


def detect_language(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """→ (doc_id, language, confidence, score, runner_up)."""
    spark = docs.sparkSession
    model = spark.createDataFrame(
        MODEL_ROWS, "lang string, g string, cu bigint")
    defaults = spark.createDataFrame(
        MODEL_DEFAULTS, "lang string, du bigint")
    kw = spark.createDataFrame(
        KEYWORD_BOOSTS, "word string, lang string, weight double")

    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("_t"))
    t = F.lower(F.col("_t"))

    # trigram multiset per doc (codepoint windows, reference :150-160)
    grams = (base
             .withColumn("_lt", t)
             .withColumn("g", F.explode(F.when(
                 F.length("_lt") >= 3,
                 F.transform(
                     F.sequence(F.lit(1), F.length("_lt") - 2),
                     lambda i: F.substring(F.col("_lt"), i, F.lit(3))))
                 .otherwise(F.array().cast("array<string>"))))
             .select("doc_id", "g"))
    scored = (grams.crossJoin(F.broadcast(defaults))
              .join(F.broadcast(model), ["lang", "g"], "left")
              .groupBy("doc_id", "lang")
              .agg(F.sum(F.coalesce("cu", "du")).alias("su"),
                   F.count(F.lit(1)).alias("cnt")))

    # keyword boosts over the accent-folded alnum/space normalization
    norm = F.regexp_replace(
        F.translate(t, ACCENT_SRC, ACCENT_DST), r"[^a-z0-9\s]", "")
    toks = (base.withColumn(
        "word", F.explode(F.filter(F.split(norm, r"\s+"),
                                   lambda x: x != "")))
        .join(F.broadcast(kw), "word")
        .groupBy("doc_id", "lang").agg(F.sum("weight").alias("boost")))

    # every (doc, lang) pair survives even with zero trigrams
    full = (base.select("doc_id").crossJoin(
        F.broadcast(defaults.select("lang")))
        .join(scored, ["doc_id", "lang"], "left")
        .join(toks, ["doc_id", "lang"], "left")
        .withColumn("score", F.round(
            F.when(F.coalesce("cnt", F.lit(0)) > 0,
                   F.col("su") / 1e6 / F.col("cnt")).otherwise(0.0)
            + F.coalesce("boost", F.lit(0.0)), 6)))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc())
    wdoc = Window.partitionBy("doc_id")
    ranked = (full.withColumn("rn", F.row_number().over(w))
              .withColumn("_rng", F.max("score").over(wdoc)
                          - F.min("score").over(wdoc))
              .withColumn("runner_up", F.lead("lang").over(w))
              .filter(F.col("rn") == 1)
              .select("doc_id", F.col("lang").alias("tg_language"),
                      F.col("score").alias("tg_score"),
                      F.when(F.col("_rng") > 0, 1.0).otherwise(0.5)
                      .alias("tg_confidence"),
                      "runner_up"))

    # script short-circuits on the ORIGINAL text, reference order
    n_chars = F.length("_t")
    script_lang, script_conf = F.lit(None).cast("string"), \
        F.lit(None).cast("double")
    for name, cls, share, conf in reversed(SCRIPTS):
        cnt = F.length(F.regexp_replace("_t", f"[^{cls}]", ""))
        hit = (cnt > 0) if share == 0.0 else \
            (cnt.cast("double") / n_chars > share)
        script_lang = F.when(hit, name).otherwise(script_lang)
        script_conf = F.when(hit, conf).otherwise(script_conf)
    is_blank = F.trim("_t") == ""

    return (base.join(ranked, "doc_id", "left")
            .select(
                "doc_id",
                F.when(is_blank, "unknown")
                .otherwise(F.coalesce(script_lang, F.col("tg_language")))
                .alias("language"),
                F.when(is_blank, 0.0)
                .otherwise(F.coalesce(script_conf,
                                      F.col("tg_confidence")))
                .alias("confidence"),
                F.when(is_blank | script_lang.isNotNull(), 0.0)
                .otherwise(F.col("tg_score")).alias("score"),
                F.when(is_blank | script_lang.isNotNull(),
                       F.lit(None).cast("string"))
                .otherwise(F.col("runner_up")).alias("runner_up")))

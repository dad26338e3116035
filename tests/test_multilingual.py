"""Golden tests for trigram-LM language detection (nlp/multilingual.rs)."""

import math

from graphrag_rs_spark.nlp.multilingual import (
    MODEL_DEFAULTS, MODEL_ROWS, detect_language)
from tests.conftest import spark  # noqa: F401


def _detect(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return {r.doc_id: r for r in detect_language(df).collect()}


def test_model_contributions_are_exact_micro_ints():
    # "the" appears in both english training sentences (3 times total:
    # "the quick", "the lazy", "the english")
    eng = {g: cu for lang, g, cu in MODEL_ROWS if lang == "english"}
    total = {lang: du for lang, du in MODEL_DEFAULTS}
    assert "the" in eng
    n_eng = sum(1 for lang, _, _ in MODEL_ROWS if lang == "english")
    assert n_eng > 50
    # LITERAL goldens (hand-derived once from multilingual.rs:174,
    # ln(1/(total+1))*1e6 with total = Σ(len(sentence)-2)): recomputing
    # the module's own formula here would be a tautology that passes for
    # any smoothing constant — these constants fail if the formula,
    # training corpus, or micro-int scale drifts
    assert total["english"] == -4356709
    assert total["french"] == -4532599
    assert total["spanish"] == -4820282
    assert eng["the"] == -3245193


def sum_total_english():
    from graphrag_rs_spark.nlp.multilingual import TRAINING
    return sum(len(t) - 2 for t in TRAINING["english"])


def test_detects_trained_languages(spark):
    got = _detect(spark, [
        "this is a test of the english language",
        "esto es una prueba del idioma espanol",
        "ceci est un test de la langue francaise",
        "dies ist ein test der deutschen sprache",
    ])
    assert got[0].language == "english"
    assert got[1].language == "spanish"
    assert got[2].language == "french"
    assert got[3].language == "german"
    # the reference's confidence quirk: any spread at all → 1.0
    assert all(r.confidence == 1.0 for r in got.values())


def test_script_short_circuits(spark):
    got = _detect(spark, [
        "这是中文文本测试内容",       # CJK ideographs > 30%
        "これはテストです",           # hiragana/katakana present
        "한국어 텍스트입니다",        # hangul > 30%
        "هذا نص عربي للاختبار",      # arabic > 30%
        "это русский текст",          # cyrillic > 30%
    ])
    expect = [("chinese", 0.9), ("japanese", 0.9), ("korean", 0.95),
              ("arabic", 0.95), ("russian", 0.9)]
    for i, (lang, conf) in enumerate(expect):
        assert (got[i].language, got[i].confidence) == (lang, conf), i
        assert got[i].score == 0.0


def test_blank_text_unknown(spark):
    got = _detect(spark, ["   "])
    assert (got[0].language, got[0].confidence) == ("unknown", 0.0)


def test_keyword_boost_changes_winner(spark):
    # "esto es texto" carries 3 Spanish boost tokens (0.5 each) — the
    # boost dominates whatever the trigram models say
    got = _detect(spark, ["esto es texto"])
    assert got[0].language == "spanish"
    assert got[0].runner_up is not None


def test_mixed_ascii_below_cjk_share_falls_through(spark):
    # 2 CJK chars out of 30 → ratio ≤ 0.3, trigram path decides
    got = _detect(spark, ["the quick brown fox jumps 中文 over it"])
    assert got[0].language == "english"

"""Golden tests for the heuristic syntax analyzer (nlp/syntax_analyzer.rs).

Expected values are the reference's own unit-test fixtures
(syntax_analyzer.rs:585-676) plus hand-traced rule applications."""

from pyspark.sql import functions as F  # noqa: F401

from graphrag_rs_spark.nlp.syntax import dependencies, noun_phrases, pos_tag
from tests.conftest import spark  # noqa: F401


def _tag(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return pos_tag(df)


def test_tokenization_splits_words_and_punct(spark):
    rows = sorted(_tag(spark, ["Hello, world!"]).collect(),
                  key=lambda r: r.token_idx)
    assert [r.token for r in rows] == ["Hello", ",", "world", "!"]
    assert [r.pos for r in rows] == ["NNP", ".", "NN", "."]


def test_pos_tag_cascade(spark):
    rows = {r.token: r.pos for r in
            _tag(spark, ["The good brown fox jumps over the lazy dog."])
            .collect()}
    assert rows["The"] == "DT"          # dict (lowercased)
    assert rows["good"] == "JJ"         # adjective dict
    assert rows["fox"] == "NN"          # default
    assert rows["jumps"] == "NNS"       # s ∧ ¬ss quirk (reference-noted)
    assert rows["."] == "."
    # dict priority quirks: first-wins in reference lookup order
    quirks = {r.token: r.pos for r in
              _tag(spark, ["what for so work 42 -- running jumped"
                           " cats massive quickly"]).collect()}
    assert quirks["what"] == "DT"       # DT before PRP
    assert quirks["for"] == "IN"        # IN before CC
    assert quirks["so"] == "CC"         # CC before RB
    assert quirks["work"] == "VB"       # VB before NN
    assert quirks["42"] == "CD"
    assert quirks["--"] == "."          # all-punct word run
    assert quirks["running"] == "VBG"
    assert quirks["jumped"] == "VBD"
    assert quirks["cats"] == "NNS"
    assert quirks["massive"] == "JJ"    # -ive
    assert quirks["quickly"] == "RB"    # -ly


def test_lemmatization_goldens(spark):
    rows = {r.token: r.lemma for r in
            _tag(spark, ["running cats jumped ladies glass The"]).collect()}
    assert rows["running"] == "runn"    # reference's own golden quirk
    assert rows["cats"] == "cat"
    assert rows["jumped"] == "jump"
    assert rows["ladies"] == "lady"     # ies → y
    assert rows["glass"] == "glass"     # ss guard
    assert rows["The"] == "the"         # non-inflected: lowercase only


def test_noun_phrase_single_run(spark):
    out = noun_phrases(_tag(spark, ["The quick brown fox"])).collect()
    assert len(out) == 1
    assert out[0].text == "The quick brown fox"
    assert out[0].start_idx == 0
    assert out[0].n_tokens == 4
    assert out[0].head_idx == 3         # last noun in the run


def test_noun_phrase_split_and_nounless_run(spark):
    out = {r.text: r for r in noun_phrases(
        _tag(spark, ["the cat quickly chased the very big"])).collect()}
    # "quickly"(RB) ends run 1; "very"(RB) ends the determiner-only run
    assert set(out) == {"the cat", "the", "big"}
    assert out["the cat"].head_idx == 1
    assert out["the"].head_idx == 0     # no noun: reference emits head 0
    assert out["big"].head_idx == 0


def test_dependencies_subject_object_determiners(spark):
    out = {(r.head_idx, r.dep_idx, r.relation) for r in
           dependencies(_tag(spark, ["The cat chased the mouse"])).collect()}
    assert out == {(2, 1, "subject"), (2, 4, "dobj"),
                   (1, 0, "determiner"), (4, 3, "determiner")}


def test_dependencies_no_verb_root_zero_quirk(spark):
    # no verb → root index 0 (reference unwrap_or(0)); no subject can
    # exist, the first noun after 0 still becomes "dobj" of token 0
    out = {(r.head_idx, r.dep_idx, r.relation) for r in
           dependencies(_tag(spark, ["bright cat mouse"])).collect()}
    assert (0, 1, "dobj") in out
    assert not any(r == "subject" for _, _, r in out)


def test_dependencies_modifiers(spark):
    # "big"(JJ dict) → next noun; "quickly"(RB) → first verb
    out = {(r.head_idx, r.dep_idx, r.relation) for r in
           dependencies(_tag(spark, ["the big cat quickly chased prey"]))
           .collect()}
    assert (2, 1, "modifier") in out     # big → cat
    assert (4, 3, "modifier") in out     # quickly → chased(VBD)

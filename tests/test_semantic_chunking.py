"""T3 semantic chunker: sentence split transliteration, breakpoint
strategies, assembly quirks (min-size merge, max-size split)."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark import reference_logic as rl
from graphrag_rs_spark.stages.semantic_chunking import (
    semantic_chunk_documents, split_sentences_df)

DOC_A = ("Databases store rows in tables. Tables use btree indexes. "
         "Indexes speed up database queries. "
         "Meanwhile penguins waddle across antarctic ice! "
         "Penguins eat krill and fish. Do penguins fly?")
DOC_B = "Just one sentence without structure"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [("a", DOC_A), ("b", DOC_B)], "doc_id string, text string").cache()


def test_split_sentences_transliteration():
    s = rl.split_sentences(DOC_A)
    assert len(s) == 6
    assert s[0] == "Databases store rows in tables."
    assert s[3] == "Meanwhile penguins waddle across antarctic ice!"
    assert s[5] == "Do penguins fly?"
    # blank lines flush, trailing text without punctuation kept
    assert rl.split_sentences("alpha beta\n\ngamma") == ["alpha beta",
                                                         "gamma"]
    assert rl.split_sentences("") == []


def test_create_chunks_quirks():
    sents = ["s0", "s1", "s2", "s3", "s4"]
    # plain breakpoints
    assert rl.create_semantic_chunks(sents, [2]) == [
        ("s0 s1", 0, 2), ("s2 s3 s4", 2, 5)]
    # min-size: a 1-sentence segment merges into the next (start not
    # advanced — faithful reference quirk)
    assert rl.create_semantic_chunks(sents, [1, 3], min_chunk_size=2) == [
        ("s0 s1 s2", 0, 3), ("s3 s4", 3, 5)]
    # max-size splits oversize segments
    assert rl.create_semantic_chunks(sents, [], max_chunk_size=2) == [
        ("s0 s1", 0, 2), ("s2 s3", 2, 4), ("s4", 4, 5)]


def test_sentence_df_matches_transliteration(docs):
    rows = split_sentences_df(docs).collect()
    got = sorted((r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows)
    want = []
    for did, text in (("a", DOC_A), ("b", DOC_B)):
        want += [(did, i, s)
                 for i, s in enumerate(rl.split_sentences(text))]
    assert got == sorted(want)


def test_absolute_strategy_breaks_at_topic_shift(docs):
    out = semantic_chunk_documents(
        docs, strategy="absolute", threshold_amount=0.85,
        dim=64).collect()
    a = sorted((r for r in out if r["doc_id"] == "a"),
               key=lambda r: r["chunk_seq"])
    # coverage: chunks tile the sentence range exactly
    assert a[0]["start_sentence"] == 0
    assert a[-1]["end_sentence"] == 6
    for prev, cur in zip(a, a[1:]):
        assert cur["start_sentence"] == prev["end_sentence"]
    joined = " ".join(r["content"] for r in a)
    assert joined == " ".join(rl.split_sentences(DOC_A))


def test_single_sentence_doc_returns_original_text(docs):
    out = semantic_chunk_documents(docs, strategy="absolute",
                                   threshold_amount=0.5, dim=32)
    b = out.filter(F.col("doc_id") == "b").collect()
    assert len(b) == 1
    assert b[0]["content"] == DOC_B          # verbatim, reference quirk
    assert b[0]["sentence_count"] == 1


def test_percentile_default_single_break(docs):
    """95th percentile over 5 diffs → exactly the max diff breaks."""
    out = semantic_chunk_documents(docs, strategy="percentile",
                                   threshold_amount=95.0).collect()
    a = [r for r in out if r["doc_id"] == "a"]
    assert len(a) in (1, 2)   # index min(floor(5*0.95), 4)=4 → max diff;
    # strict > never exceeds the max itself → 1 chunk
    total = sum(r["sentence_count"] for r in a)
    assert total == 6


def test_stddev_strategy_runs(docs):
    out = semantic_chunk_documents(docs, strategy="stddev",
                                   threshold_amount=1.0).collect()
    a = [r for r in out if r["doc_id"] == "a"]
    assert sum(r["sentence_count"] for r in a) == 6

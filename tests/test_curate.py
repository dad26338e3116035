"""End-to-end corpus curation stage (scrub → score → dedup → split)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.stages.curate import curate_documents


GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "far away into the woods with friends for the whole day") * 2


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", GOOD + " one"),
        ("d2", GOOD + " two"),
        ("d3", GOOD + " one"),          # exact dup of d1
        ("d4", "x"),                     # too short: quality floor
        ("d5", GOOD + " mail bob@x.com today"),   # carries PII
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_curate_counts_and_survivors(corpus):
    curated, counts = curate_documents(corpus, min_quality=0.5)
    rows = {r["doc_id"]: r for r in curated.collect()}

    assert counts["input_docs"] == 5
    assert counts["dedup_dropped"] == 1          # d3 loses to d1
    assert counts["quality_dropped"] == 1        # d4
    assert counts["pii_redactions"] == 1         # d5's email
    assert counts["survivors"] == 3 == len(rows)
    assert set(rows) == {"d1", "d2", "d5"}
    assert sum(counts["splits"].values()) == counts["survivors"]

    assert "<EMAIL>" in rows["d5"]["text_clean"]
    assert rows["d1"]["group_size"] == 2
    for r in rows.values():
        assert r["split"] in ("train", "val", "test")
        assert r["quality"] >= 0.5
        assert r["lang"] == "en"


def test_curate_is_deterministic(corpus):
    a, ca = curate_documents(corpus)
    b, cb = curate_documents(corpus)
    assert ca == cb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

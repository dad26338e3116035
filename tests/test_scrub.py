"""PII scrubbing chain (training-pipeline op)."""

from __future__ import annotations

from graphrag_rs_spark.operators.scrub import scrub_pii


def test_scrub_all_kinds_and_order(spark):
    rows = [
        ("d1", "mail me at jo.doe+x@corp.example.org please"),
        ("d2", "see https://a.example/path?u=bob@x.com for details"),
        ("d3", "host 192.168.1.254 answered"),
        ("d4", "call +1(555)123-4567 now"),
        ("d5", "plain text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}

    assert out["d1"]["text_clean"] == "mail me at <EMAIL> please"
    assert out["d1"]["n_email"] == 1

    # the email inside the URL is consumed BY the URL stage
    d2 = out["d2"]
    assert d2["text_clean"] == "see <URL> for details"
    assert (d2["n_url"], d2["n_email"]) == (1, 0)

    assert out["d3"]["text_clean"] == "host <IPV4> answered"
    assert out["d3"]["n_phone"] == 0     # ipv4 runs before phone

    assert out["d4"]["text_clean"] == "call <PHONE> now"
    assert out["d4"]["n_phone"] == 1

    d5 = out["d5"]
    assert d5["text_clean"] == rows[4][1]  # no PII: byte-identical passthrough
    assert (d5["n_url"], d5["n_email"], d5["n_ipv4"], d5["n_phone"]) \
        == (0, 0, 0, 0)


def test_scrub_is_one_scan_side_projection(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

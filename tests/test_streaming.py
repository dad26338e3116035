"""Structured Streaming incremental indexing == batch build parity."""

import os

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG
from graphrag_rs_spark.datagen import generate_rows
from graphrag_rs_spark.streaming import incremental


@pytest.fixture(scope="module")
def split_input(spark, tmp_path_factory):
    """Two increments of whole conversations, written as separate files."""
    rows = generate_rows(20, seed=42, max_turns=20)
    half = {f"conv_{c:06d}" for c in range(10)}
    d = tmp_path_factory.mktemp("stream_in")
    for name, pred in (("batch1", lambda r: r["conv_id"] in half),
                       ("batch2", lambda r: r["conv_id"] not in half)):
        df = spark.createDataFrame([r for r in rows if pred(r)])
        # write with the input_hint contract type (turn_idx: int32)
        df = df.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        df.coalesce(1).write.mode("overwrite").parquet(str(d / name))
    return rows, d


def test_incremental_equals_batch(spark, split_input, tmp_path):
    rows, d = split_input
    out = str(tmp_path / "out")

    # two micro-batch increments via the shared stage functions
    for sub in ("batch1", "batch2"):
        batch = spark.read.parquet(str(d / sub))
        counts = incremental.process_increment(batch, out, DEFAULT_CONFIG)
        assert counts["chunks"] > 0

    entities, flat = incremental.merge_increment_tables(spark, out)

    # batch oracle over the full input
    from graphrag_rs_spark.stages.pipeline import run_pipeline
    full = run_pipeline(spark, spark.createDataFrame(rows))

    inc_ents = {(r["entity_id"], r["mention_count"])
                for r in entities.collect()}
    bat_ents = {(r["entity_id"], r["mention_count"])
                for r in full.entities.collect()}
    assert inc_ents == bat_ents

    inc_triples = {(r["subj"], r["pred"], r["obj"]) for r in flat.collect()}
    bat_triples = {(r["subj"], r["pred"], r["obj"])
                   for r in full.triple_mentions.collect()}
    assert inc_triples == bat_triples


def _write_turns(spark, path, rows):
    from graphrag_rs_spark.streaming.incremental import TRANSCRIPT_SCHEMA

    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_sessionize_semantics(spark, tmp_path):
    """Stateful sessionization: gap close, turn dedup, byte-identical
    re-emission in stable turn order (the north-rule invariant)."""
    import datetime as dt

    from graphrag_rs_spark.streaming.incremental import TRANSCRIPT_SCHEMA
    from graphrag_rs_spark.streaming.sessionize import (
        assemble_conversations_stream,
    )

    def T(minutes):
        return dt.datetime(2026, 1, 1, 12, 0, 0) + dt.timedelta(
            minutes=minutes)

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    _write_turns(spark, os.path.join(indir, "b1"), [
        ("A", 0, "user", "hello a0", None, T(0)),
        ("A", 1, "assistant", "reply a1", "search", T(1)),
        ("B", 0, "user", "hello b0", None, T(2)),
    ])
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(
        os.path.join(indir, "*"))
    closed = assemble_conversations_stream(stream, gap_minutes=5.0)
    q = (closed.writeStream.format("memory").queryName("sess_closed")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        assert spark.sql("select * from sess_closed").count() == 0

        # late-but-in-gap turn for A, duplicate re-delivery of A1 with
        # DIFFERENT text (at-least-once source; keep-first must win),
        # and a clock conversation advancing event time past A+B's gap
        _write_turns(spark, os.path.join(indir, "b2"), [
            ("A", 2, "user", "followup a2", None, T(3)),
            ("A", 1, "assistant", "REDELIVERED", None, T(1)),
            ("C", 0, "user", "tick", None, T(30)),
        ])
        q.processAllAvailable()
        got = {(r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts)
               for r in spark.sql("select * from sess_closed").collect()}
        assert set(got) == {("A", 0), ("A", 1), ("A", 2), ("B", 0)}
        # byte-identical per-turn payload, keep-first dedup, ts round-trip
        assert got[("A", 1)] == ("assistant", "reply a1", "search", T(1))
        assert got[("A", 2)] == ("user", "followup a2", None, T(3))
        assert got[("B", 0)] == ("user", "hello b0", None, T(2))
    finally:
        q.stop()


def test_sessionized_stream_equals_batch(spark, tmp_path):
    """Turn-event stream (conversations split across micro-batches) →
    sessionize → process_increment == one-shot batch build."""
    from graphrag_rs_spark.streaming.sessionize import (
        stream_sessionized_index,
    )

    rows = generate_rows(8, seed=7, max_turns=12)
    rows = [dict(r) for r in rows]
    ts_sorted = sorted(r["ts"] for r in rows)
    cutoff = ts_sorted[len(ts_sorted) // 2]
    max_ts = ts_sorted[-1]
    import datetime as dt
    clock1 = {"conv_id": "zz_clock1", "turn_idx": 0, "role": "user",
              "text": "tick", "tool": None,
              "ts": max_ts + dt.timedelta(hours=10)}
    clock2 = {"conv_id": "zz_clock2", "turn_idx": 0, "role": "user",
              "text": "tock", "tool": None,
              "ts": max_ts + dt.timedelta(hours=20)}

    def as_tuples(rs):
        return [(r["conv_id"], int(r["turn_idx"]), r["role"], r["text"],
                 r["tool"], r["ts"]) for r in rs]

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    # time-ordered delivery (log tailing): early turns, then the rest
    _write_turns(spark, os.path.join(indir, "b1"),
                 as_tuples([r for r in rows if r["ts"] <= cutoff]))
    out = str(tmp_path / "out")
    q = stream_sessionized_index(
        spark, os.path.join(indir, "*"), out, str(tmp_path / "ck"),
        gap_minutes=30.0, trigger_once=False)
    try:
        q.processAllAvailable()
        _write_turns(spark, os.path.join(indir, "b2"),
                     as_tuples([r for r in rows if r["ts"] > cutoff]))
        q.processAllAvailable()
        _write_turns(spark, os.path.join(indir, "b3"), as_tuples([clock1]))
        q.processAllAvailable()
        _write_turns(spark, os.path.join(indir, "b4"), as_tuples([clock2]))
        q.processAllAvailable()
    finally:
        q.stop()

    entities, flat = incremental.merge_increment_tables(spark, out)

    # batch oracle: everything that closed (8 convs + clock1; clock2
    # stays open — no later event ever advances the watermark past it)
    batch = spark.createDataFrame(as_tuples(rows + [clock1]),
                                  incremental.TRANSCRIPT_SCHEMA)
    oracle_out = str(tmp_path / "oracle")
    incremental.process_increment(batch, oracle_out, DEFAULT_CONFIG)
    o_entities, o_flat = incremental.merge_increment_tables(
        spark, oracle_out)

    inc = {(r["entity_id"], r["mention_count"])
           for r in entities.collect()}
    bat = {(r["entity_id"], r["mention_count"])
           for r in o_entities.collect()}
    assert inc == bat
    assert ({(r["subj"], r["pred"], r["obj"]) for r in flat.collect()}
            == {(r["subj"], r["pred"], r["obj"])
                for r in o_flat.collect()})


def test_sessionize_non_utc_session_timezone(spark, tmp_path):
    """Gap timeouts must be computed in true epoch even when the session
    timezone is not UTC (Arrow hands the UDF session-local naive
    timestamps while the watermark API speaks epoch millis)."""
    import datetime as dt

    from graphrag_rs_spark.streaming.incremental import TRANSCRIPT_SCHEMA
    from graphrag_rs_spark.streaming.sessionize import (
        assemble_conversations_stream,
    )

    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")

    def T(minutes):
        return dt.datetime(2026, 1, 1, 12, 0, 0) + dt.timedelta(
            minutes=minutes)

    def write(name, rows):
        (s2.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1)
         .write.mode("overwrite").parquet(str(tmp_path / "in" / name)))

    os.makedirs(str(tmp_path / "in"))
    write("b1", [
        ("A", 0, "user", "hello a0", None, T(0)),
        ("A", 1, "assistant", "reply a1", None, T(1)),
    ])
    stream = s2.readStream.schema(TRANSCRIPT_SCHEMA).parquet(
        str(tmp_path / "in" / "*"))
    closed = assemble_conversations_stream(stream, gap_minutes=5.0)
    q = (closed.writeStream.format("memory").queryName("sess_tz")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # in-gap turn + a clock 3 minutes later: must NOT close A yet
        # (a naive-local mix closes it here — local epoch lags true
        # epoch by 5h, degenerating the timeout to watermark+1s)
        write("b2", [("A", 2, "user", "followup a2", None, T(3)),
                     ("B", 0, "user", "tick", None, T(6))])
        q.processAllAvailable()
        write("b2x", [("B", 1, "user", "tick", None, T(7))])
        q.processAllAvailable()
        assert s2.sql("select count(*) from sess_tz").first()[0] == 0
        # now advance past the gap: A closes with all three turns
        write("b3", [("C", 0, "user", "tock", None, T(60))])
        q.processAllAvailable()
        got = {(r.conv_id, r.turn_idx): r.ts
               for r in s2.sql("select * from sess_tz").collect()}
    finally:
        q.stop()
    assert {k for k in got if k[0] == "A"} == {("A", 0), ("A", 1),
                                              ("A", 2)}
    # byte-identical timestamp round-trip in the non-UTC zone
    assert got[("A", 2)] == T(3)


def test_sessionize_state_survives_restart(spark, tmp_path):
    """Stop the stream mid-conversation and restart from the checkpoint:
    buffered turns live in the state store, so the reassembled
    conversation must be complete — the streaming analogue of the batch
    kill-and-resume byte-identity guarantee."""
    import datetime as dt

    from graphrag_rs_spark.streaming.incremental import TRANSCRIPT_SCHEMA
    from graphrag_rs_spark.streaming.sessionize import (
        assemble_conversations_stream,
    )

    def T(minutes):
        return dt.datetime(2026, 1, 1, 12, 0, 0) + dt.timedelta(
            minutes=minutes)

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    ck = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")

    def start():
        # file sink, not memory: only replayable sinks support restarting
        # from a checkpoint
        stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(
            os.path.join(indir, "*"))
        closed = assemble_conversations_stream(stream, gap_minutes=5.0)
        return (closed.writeStream.format("parquet")
                .option("path", outdir)
                .option("checkpointLocation", ck)
                .outputMode("append").start())

    _write_turns(spark, os.path.join(indir, "b1"), [
        ("A", 0, "user", "first half", None, T(0)),
        ("A", 1, "assistant", "still open", None, T(1)),
    ])
    q1 = start()
    q1.processAllAvailable()
    q1.stop()     # conversation A is open, buffered only in state

    _write_turns(spark, os.path.join(indir, "b2"), [
        ("A", 2, "user", "second half", None, T(2)),
        ("C", 0, "user", "tick", None, T(30)),   # closes A
    ])
    q2 = start()
    try:
        q2.processAllAvailable()
        got = {(r.conv_id, r.turn_idx): r.text
               for r in spark.read.parquet(outdir).collect()}
    finally:
        q2.stop()
    # all three turns present: 0-1 recovered from state, 2 from b2
    assert got == {("A", 0): "first half", ("A", 1): "still open",
                   ("A", 2): "second half"}


def test_sessionize_giant_conversation(spark, tmp_path):
    """Conversation-length skew: one 5000-turn conversation delivered
    out of order across two batches reassembles completely and in
    order (one state entry, not one hot partition)."""
    import datetime as dt
    import random

    from graphrag_rs_spark.streaming.incremental import TRANSCRIPT_SCHEMA
    from graphrag_rs_spark.streaming.sessionize import (
        assemble_conversations_stream,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    turns = [("big", i, "user", f"turn {i}", None,
              base + dt.timedelta(seconds=i)) for i in range(5000)]
    rng = random.Random(13)
    rng.shuffle(turns)   # arrival order != turn order

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    _write_turns(spark, os.path.join(indir, "b1"), turns[:2500])
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(
        os.path.join(indir, "*"))
    # watermark delay must cover the full shuffle span (5000 s) so no
    # out-of-order turn is considered late
    closed = assemble_conversations_stream(
        stream, gap_minutes=2.0, watermark_delay="6000 seconds")
    q = (closed.writeStream.format("memory").queryName("sess_big")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        _write_turns(spark, os.path.join(indir, "b2"), turns[2500:])
        q.processAllAvailable()
        clock = ("zz", 0, "user", "tick", None,
                 base + dt.timedelta(days=1))
        _write_turns(spark, os.path.join(indir, "b3"), [clock])
        q.processAllAvailable()
        got = [(r.turn_idx, r.text) for r in spark.sql(
            "select * from sess_big where conv_id = 'big'").collect()]
    finally:
        q.stop()
    assert got == [(i, f"turn {i}") for i in range(5000)]


def test_streaming_rollup_matches_batch_and_drops_late(spark, tmp_path):
    """Watermarked streaming rollup == batch rollup over on-time events;
    events older than the watermark are dropped, not merged."""
    import datetime as dt

    from graphrag_rs_spark.operators.temporal import tumbling_rollup
    from graphrag_rs_spark.streaming.windowed import streaming_rollup

    def T(h, m):
        return dt.datetime(2026, 1, 1, h, m, 0)

    EVENT_SCHEMA = "event_type string, value double, ts timestamp"

    def write(name, rows):
        (spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)
         .write.mode("overwrite").parquet(str(tmp_path / "in" / name)))

    os.makedirs(str(tmp_path / "in"))
    # the 11:45 event pushes the watermark to 11:15 — PAST the 10:00
    # window's end, which is the condition for dropping late rows (a
    # window absorbs late events until the watermark passes its end)
    on_time = [
        ("A", 1.0, T(10, 5)),
        ("A", 2.0, T(10, 20)),
        ("B", 3.0, T(10, 40)),
        ("A", 4.0, T(11, 45)),
    ]
    write("b1", on_time)
    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .parquet(str(tmp_path / "in" / "*")))
    rolled = streaming_rollup(stream, width="1 hour", delay="30 minutes")
    q = (rolled.writeStream.format("memory").queryName("roll")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # b2: a late event whose window [10:00, 11:00) closed under the
        # 11:15 watermark — must be DROPPED — plus a clock advancing the
        # watermark to 12:00, closing the 11:00 window
        clock1 = ("C", 0.0, T(12, 30))
        write("b2", [("A", 99.0, T(10, 15)), clock1])
        q.processAllAvailable()
        write("b3", [("C", 0.0, T(14, 0))])   # closes clock1's window
        q.processAllAvailable()
        got = {(r.window_start, r.key): (r.n_events, r.sum_value,
                                         r.avg_value)
               for r in spark.sql("select * from roll").collect()}
    finally:
        q.stop()

    closed = tumbling_rollup(
        spark.createDataFrame(on_time + [clock1], EVENT_SCHEMA),
        width="1 hour",
    ).filter(F.col("window_start") < F.lit(T(13, 0)))
    want = {(r.window_start, r.key): (r.n_events, r.sum_value,
                                      r.avg_value)
            for r in closed.collect()}
    assert got == want
    # the late 99.0 never appears anywhere
    assert all(v[1] != 99.0 for v in got.values())


def test_stream_index_available_now(spark, split_input, tmp_path):
    _, d = split_input
    # stream source dir with both files
    src = str(tmp_path / "src")
    os.makedirs(src)
    for sub in ("batch1", "batch2"):
        for f in os.listdir(str(d / sub)):
            if f.endswith(".parquet"):
                os.link(str(d / sub / f), os.path.join(src, f"{sub}_{f}"))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = incremental.stream_index(spark, src, out, ck, trigger_once=True)
    q.awaitTermination(120)
    ents, flat = incremental.merge_increment_tables(spark, out)
    assert ents.count() > 0
    assert flat.count() > 0


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicates are dropped across micro-batches (bounded state);
    survivors carry the batch operator's content hash."""
    import datetime as dt
    from graphrag_rs_spark.streaming.dedup import streaming_exact_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = tmp_path / "docs_in"
    b1 = [("a1", "The quick brown fox.", t0),
          ("a2", "Totally different text", t0),
          # same normalized content as a1 (case/punct differ)
          ("a3", "the QUICK brown fox", t0)]
    b2 = [("b1", "The quick brown fox.", t0),      # dup of a1, later batch
          ("b2", "fresh content here", t0)]
    schema = "doc_id string, text string, ts timestamp"
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    deduped = streaming_exact_dedup(stream, delay="30 minutes")
    q = (deduped.writeStream.format("memory").queryName("sdedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("select * from sdedup").collect()
    # 3 distinct normalized payloads survive out of 5 rows
    assert len(rows) == 3
    hashes = [r["text_hash"] for r in rows]
    assert len(set(hashes)) == 3
    texts = {r["text"] for r in rows}
    assert "Totally different text" in texts
    assert "fresh content here" in texts
    # exactly one of the fox variants survived
    assert len({t for t in texts if "rown fox" in t}) == 1

    # stream-side hash == batch-side dedup key for the same payload
    from graphrag_rs_spark.operators.dedup import exact_duplicates
    batch = exact_duplicates(
        spark.createDataFrame(b1 + b2, schema).select("doc_id", "text"))
    assert {r["text_hash"] for r in batch.collect()} >= set(hashes)

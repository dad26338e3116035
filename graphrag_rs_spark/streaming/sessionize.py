"""Stateful streaming sessionization: turn events → complete conversations.

The batch incremental path (incremental.py) assumes each micro-batch
carries WHOLE conversations — the reference's own streaming importer has
the same contract (StreamingImporter batches complete documents,
pipeline/data_import.rs:604-612).  A live transcript log violates it:
turns arrive one at a time, out of order across micro-batches, and a
conversation is only "done" when no further turn shows up for a while.

This module closes that gap Spark-natively with
``applyInPandasWithState`` (arbitrary stateful processing, Arrow-batched):

  * group the turn stream by ``conv_id``;
  * accumulate turns in group state, deduplicating re-deliveries by
    ``turn_idx`` (keep-first, matching the at-least-once source
    contract);
  * set an event-time timeout at ``last_turn_ts + gap``; when the
    watermark passes it, emit the conversation as FLAT turn rows —
    exactly the transcript schema — and drop the state.

Emitting the batch-input shape (not a nested array) means the output
composes with ``incremental.process_increment`` unchanged, so the
north-rule invariant (per-turn text equality under stable turn order) is
preserved end-to-end by construction: this operator only ever buffers
and re-emits the turn rows byte-identically.

Scale posture: state is O(open conversations) and partitioned by
``conv_id`` (the natural shuffle key, also the skew axis — one giant
conversation is one state entry, not one partition).  The HDFS-backed
state store checkpoints per micro-batch, so a killed stream resumes with
its open sessions intact — the streaming analogue of the batch
checkpoint lineage (stages/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

# Output = exactly the input shape (flat turns), so it composes with
# process_increment unchanged.
OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])

# State: parallel arrays of buffered turn fields.  Timestamps are stored
# as integer microseconds — primitive state columns round-trip through
# the Arrow state serializer with no timezone ambiguity.
STATE_SCHEMA = StructType([
    StructField("turn_idx", ArrayType(IntegerType())),
    StructField("role", ArrayType(StringType())),
    StructField("text", ArrayType(StringType())),
    StructField("tool", ArrayType(StringType())),
    StructField("ts_us", ArrayType(LongType())),
])

_US = 1_000_000


def _emit(state_row: tuple, tz: str) -> pd.DataFrame:
    """State tuple → flat turn rows in stable (turn_idx) order.

    ts_us holds TRUE epoch micros; Arrow hands pandas timestamps back to
    Spark as session-zone-naive, so convert epoch → `tz`-local naive."""
    idx, role, text, tool, ts_us = state_row
    order = sorted(range(len(idx)), key=lambda i: idx[i])
    ts = (pd.to_datetime([ts_us[i] for i in order], unit="us", utc=True)
          .tz_convert(tz).tz_localize(None))
    return pd.DataFrame({
        "turn_idx": [idx[i] for i in order],
        "role": [role[i] for i in order],
        "text": [text[i] for i in order],
        "tool": [tool[i] for i in order],
        "ts": ts,
    })


def _make_fn(gap_us: int, tz: str):
    """Build the per-group state function (gap + session tz baked in).

    `tz` is the Spark session timezone: Arrow delivers TimestampType
    columns to pandas as naive values LOCALIZED to it, while
    `getCurrentWatermarkMs`/`setTimeoutTimestamp` speak true epoch — so
    ingest re-localizes to true epoch before comparing (a naive mix is
    only correct when the session runs UTC)."""

    def fn(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # Watermark passed last_ts + gap: the conversation is closed.
            out = _emit(state.get, tz)
            state.remove()
            out.insert(0, "conv_id", conv_id)
            yield out
            return

        if state.exists:
            idx, role, text, tool, ts_us = (list(c) for c in state.get)
        else:
            idx, role, text, tool, ts_us = [], [], [], [], []
        seen = set(idx)
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                ti = int(r.turn_idx)
                if ti in seen:        # at-least-once source: keep-first
                    continue
                seen.add(ti)
                idx.append(ti)
                role.append(r.role)
                text.append(r.text)
                tool.append(None if r.tool is None or pd.isna(r.tool)
                            else r.tool)
                ts_us.append(int(
                    pd.Timestamp(r.ts)
                    .tz_localize(tz, ambiguous=True,
                                 nonexistent="shift_forward")
                    .value // 1000))
        state.update((idx, role, text, tool, ts_us))
        # Close when the stream's event clock is `gap` past the newest
        # buffered turn.  The timeout must sit strictly beyond the
        # current watermark or Spark rejects it — a turn that arrives
        # later than `gap` after its own timestamp (allowed by the
        # watermark only if some other key lags) still gets a grace tick.
        close_at_us = max(ts_us) + gap_us
        wm_us = state.getCurrentWatermarkMs() * 1000
        state.setTimeoutTimestamp(max(close_at_us, wm_us + _US) // 1000)
        return  # nothing to emit until the session closes

    return fn


def assemble_conversations_stream(
    turns: DataFrame,
    gap_minutes: float = 30.0,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Turn-event stream → stream of completed conversations (flat turns).

    `turns` must be a STREAMING DataFrame with the transcript schema
    (conv_id, turn_idx, role, text, tool, ts).  A conversation closes
    when event time advances `gap_minutes` past its newest turn; its
    turns are then emitted byte-identical, sorted by turn_idx, in one
    micro-batch (append mode).

    `watermark_delay` bounds out-of-orderness ACROSS conversations
    (default: the session gap itself — a turn later than that is treated
    as a new conversation fragment, mirroring the reference incremental
    store's merge-on-arrival semantics, graph/incremental/store.rs).
    """
    delay = watermark_delay or f"{int(gap_minutes * 60)} seconds"
    gap_us = int(gap_minutes * 60) * _US
    tz = turns.sparkSession.conf.get(
        "spark.sql.session.timeZone") or "UTC"
    return (
        turns.withWatermark("ts", delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_fn(gap_us, tz),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessionized_index(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg=None,
    gap_minutes: float = 30.0,
    trigger_once: bool = True,
):
    """readStream(turn events) → sessionize → incremental graph tables.

    The composition point: closed conversations re-enter the SAME batch
    stages via ``process_increment`` (no forked logic), so stream output
    equals the batch build over the same conversations — tested in
    tests/test_streaming.py::test_sessionized_stream_equals_batch.
    """
    from graphrag_rs_spark.config import DEFAULT_CONFIG
    from graphrag_rs_spark.streaming.incremental import (
        TRANSCRIPT_SCHEMA, process_increment,
    )

    cfg = cfg or DEFAULT_CONFIG
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
    )
    closed = assemble_conversations_stream(stream, gap_minutes=gap_minutes)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        process_increment(batch, out_dir, cfg)

    writer = (
        closed.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

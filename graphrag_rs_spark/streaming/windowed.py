"""Watermarked streaming rollups: the batch temporal aggs, live.

``operators/temporal.py tumbling_rollup`` is pure ``F.window`` +
aggregation, which Structured Streaming runs natively — the ONLY
streaming-specific decision is the watermark, which bounds both state
(how long a window stays open) and lateness (events older than the
watermark are dropped, never silently merged into closed windows).

This module is deliberately thin: it applies the watermark and reuses
the SAME batch function, so stream output == batch output over the
on-time events by construction (tested in tests/test_streaming.py).
The reference has no streaming analytics at all — its temporal module
(graph/temporal.rs:120-380) is scan-based and batch-only — so this is
engine-added capability, not parity surface.

Scale posture: state is one row per (window, key) held for
``delay`` past window close; partitioned by the groupBy key. Append
mode emits each window exactly once, when the watermark passes its
end — the right contract for downstream incremental consumers
(the window row never needs upserting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graphrag_rs_spark.operators.temporal import tumbling_rollup


def streaming_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width: str = "1 hour",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming tumbling-window rollup (append mode, watermarked).

    `events` must be a streaming DataFrame. A window emits once, after
    event time passes window_end + `delay`; events later than `delay`
    are dropped by the watermark (bounded state, explicit lateness
    contract).
    """
    return tumbling_rollup(
        events.withWatermark(ts_col, delay),
        ts_col=ts_col, key_col=key_col, value_col=value_col, width=width,
    )

"""Stateful stream-stream join: tool-call turns ↔ response turns.

North-rule operator; reference anchor is FK parent/child correlation
and dependency blocking (/root/reference/lib/datamodel/foreignkey.py:
89-100, clients/errorqueue.py:700-710) — see the batch twin in
hermes_spark/operators/tooljoin.py, whose output this stream must match
(tests assert it).

Both sides are watermarked; the join condition bounds the event-time
distance, which is what lets Spark evict call-side state once the
response watermark passes call_ts + max_lag — state retention is
O(open calls within the lag window), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_correlate_tool_calls(
    turns: DataFrame,
    watermark: str = "10 minutes",
    max_lag_seconds: int = 3600,
) -> DataFrame:
    """Streaming inner join of tool-call turns with candidate response
    turns (first-response selection happens downstream per micro-batch
    or in the batch oracle; streaming emits all in-window candidates —
    outer/no-match calls surface after watermark expiry when run with
    leftOuter).
    """
    calls = (
        turns.where((F.col("role") == "assistant") & F.col("tool").isNotNull())
        .select(
            F.col("conv_id"),
            F.col("turn_idx").alias("call_turn_idx"),
            F.col("tool"),
            F.col("ts").alias("call_ts"),
        )
        .withWatermark("call_ts", watermark)
    )
    resps = (
        turns.where(F.col("role") == "tool")
        .select(
            F.col("conv_id").alias("r_conv_id"),
            F.col("turn_idx").alias("resp_turn_idx"),
            F.col("ts").alias("resp_ts"),
        )
        .withWatermark("resp_ts", watermark)
    )
    return calls.join(
        resps,
        F.expr(
            f"""
            conv_id = r_conv_id
            AND resp_turn_idx > call_turn_idx
            AND resp_ts >= call_ts
            AND resp_ts <= call_ts + INTERVAL {max_lag_seconds} SECONDS
            """
        ),
        "inner",
    ).select(
        "conv_id",
        "call_turn_idx",
        "tool",
        "call_ts",
        "resp_turn_idx",
        "resp_ts",
        (F.col("resp_ts").cast("double") - F.col("call_ts").cast("double")).alias(
            "latency_s"
        ),
    )

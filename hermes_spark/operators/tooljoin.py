"""Tool-call ↔ response correlation (the stream-stream join, batch form).

Reference anchor: FK parent/child correlation + the error queue's
dependency blocking (/root/reference/lib/datamodel/foreignkey.py:89-100,
clients/errorqueue.py:700-710) — an event is only actionable once its
correlated counterpart exists.  Transcript analog per the north rule:
an assistant turn carrying ``tool`` is answered by the next
``role='tool'`` turn in the same conversation.

Batch form: conditional self-join on conv_id with a turn/time range
predicate, then keep the *first* response per call (min turn_idx) via
``min_by`` — equi-join on conv_id keeps the shuffle keyed and lets AQE
handle skewed conversations; the range predicate is applied post-join
within each conv partition.  The streaming form
(hermes_spark/streaming/join.py) uses the same predicate with
watermarks bounding state retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_tool_calls(
    turns: DataFrame,
    max_lag_seconds: int = 3600,
) -> DataFrame:
    """Pair each tool-call turn with its first subsequent tool-response
    turn in the same conversation within ``max_lag_seconds``.

    Output: (conv_id, call_turn_idx, tool, call_ts, resp_turn_idx,
    resp_ts, latency_s) — left outer, so unanswered calls appear with
    NULL response columns (they are the "blocked" events).
    """
    calls = turns.where(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    ).select(
        F.col("conv_id"),
        F.col("turn_idx").alias("call_turn_idx"),
        F.col("tool"),
        F.col("ts").alias("call_ts"),
    )
    resps = turns.where(F.col("role") == "tool").select(
        F.col("conv_id").alias("r_conv_id"),
        F.col("turn_idx").alias("resp_turn_idx"),
        F.col("ts").alias("resp_ts"),
    )
    j = calls.join(
        resps,
        (F.col("conv_id") == F.col("r_conv_id"))
        & (F.col("resp_turn_idx") > F.col("call_turn_idx"))
        & (F.col("resp_ts") >= F.col("call_ts"))
        & (
            F.col("resp_ts")
            <= F.col("call_ts") + F.expr(f"INTERVAL {max_lag_seconds} SECONDS")
        ),
        "left_outer",
    )
    return (
        j.groupBy("conv_id", "call_turn_idx", "tool", "call_ts")
        .agg(
            F.min("resp_turn_idx").alias("resp_turn_idx"),
            F.min_by("resp_ts", "resp_turn_idx").alias("resp_ts"),
        )
        .withColumn(
            "latency_s",
            (F.col("resp_ts").cast("double") - F.col("call_ts").cast("double")),
        )
    )

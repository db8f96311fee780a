"""Streaming exact deduplication: content-fingerprint dedup inside the
live CDC/ingest stream.

The batch dedup family (functions/dedup.py) answers "which docs in the
corpus are copies"; this answers the streaming form — "drop arriving
rows whose content was already seen recently" — the guard an ingest
pipeline puts in front of the sink so replayed/duplicated upstream
events (reference anchor: the bus re-delivery semantics,
/root/reference/lib/datamodel/eventqueue.py event re-read on resume)
don't fan duplicate work downstream.

Scale design: ``dropDuplicatesWithinWatermark`` keeps state PER
DISTINCT FINGERPRINT seen within the watermark horizon and evicts it
by event time — state is O(distinct recent content), not O(stream
history), which is what survives a 10^12-turn stream.  The fingerprint
is the same normalized sha256 the batch family uses, computed JVM-side;
keying state on a hash also spreads mega-conversation skew uniformly
across the state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hermes_spark.functions.text import normalized_fingerprint


def stream_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
    extra_key: list[str] | None = None,
    fingerprint: Column | None = None,
) -> DataFrame:
    """Drop rows whose (fingerprint, *extra_key) was already emitted
    within the watermark horizon; the FIRST arrival survives.

    ``extra_key`` scopes the dedup (e.g. ``["conv_id"]`` dedups within
    a conversation only); ``fingerprint`` overrides the content hash
    (any deterministic Column).  The watermark bounds both lateness
    handling and state retention — a duplicate arriving later than the
    watermark delay after its twin is NOT suppressed (its state was
    evicted), which is the documented, bounded-state contract.

    Rows whose fingerprint is NULL (e.g. text-less tool/metadata
    events under the default content hash) pass through UNDEDUPED —
    they are not copies of each other, and keying them together would
    silently drop all but the first per horizon."""
    if "_fp" in stream.columns:
        raise ValueError(
            "input already has a column named _fp — rename it or pass "
            "fingerprint= explicitly over a different working column"
        )
    fp = (
        fingerprint
        if fingerprint is not None
        else normalized_fingerprint(text_col)
    )
    keyed = stream.withColumn("_fp", fp).withWatermark(ts_col, watermark)
    deduped = keyed.where(F.col("_fp").isNotNull()).dropDuplicatesWithinWatermark(
        ["_fp", *(extra_key or [])]
    )
    passthrough = keyed.where(F.col("_fp").isNull())
    return deduped.unionByName(passthrough).drop("_fp")

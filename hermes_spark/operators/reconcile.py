"""Source↔target reconciliation via per-conversation merkle digests.

The reference's functional tests use dataset diffs as their own oracle
(client-vs-server diffFrom comparisons,
/root/reference/tests/functional/test_scenario_01_single_datasource.py:
123-127).  At 10^12 turns a row-by-row diff is not a sane acceptance
check; the merkle design makes reconciliation a join of two tiny digest
tables: any insert/update/delete discrepancy in any turn changes the
conversation digest, so ``reconcile`` localizes divergence to specific
conv_ids with one aggregate per side + one join — O(conversations)
shuffle, not O(turns).  ``drill_down`` then diffs only the flagged
conversations row-by-row (bounded work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hermes_spark.operators.checksum import conversation_merkle
from hermes_spark.operators.diff import snapshot_diff


def reconcile(
    source: DataFrame,
    target: DataFrame,
    key: str = "conv_id",
) -> DataFrame:
    """Digest-compare two transcript tables.

    Returns one row per diverging conversation:
    (conv_id, status ∈ {missing_in_target, extra_in_target, mismatch},
    src_n_turns, tgt_n_turns).  Empty result = tables equivalent."""
    s = conversation_merkle(source, key=key).select(
        F.col(key),
        F.col("conv_cksum").alias("src_cksum"),
        F.col("n_turns").alias("src_n_turns"),
    )
    t = conversation_merkle(target, key=key).select(
        F.col(key).alias("_tk"),
        F.col("conv_cksum").alias("tgt_cksum"),
        F.col("n_turns").alias("tgt_n_turns"),
    )
    j = s.join(t, s[key] == t["_tk"], "full_outer")
    status = (
        F.when(F.col("_tk").isNull(), "missing_in_target")
        .when(F.col(key).isNull(), "extra_in_target")
        .when(F.col("src_cksum") != F.col("tgt_cksum"), "mismatch")
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(
            F.coalesce(F.col(key), F.col("_tk")).alias(key),
            "status",
            "src_n_turns",
            "tgt_n_turns",
        )
    )


def drill_down(
    source: DataFrame,
    target: DataFrame,
    diverged: DataFrame,
    key: str = "conv_id",
) -> DataFrame:
    """Row-level diff restricted to the diverged conversations (the
    bounded second phase)."""
    keys = diverged.select(key)
    s = source.join(keys, key, "left_semi")
    t = target.join(keys, key, "left_semi")
    return snapshot_diff(
        s, t, key=[key, "turn_idx"], compare_cols=["role", "text", "tool"]
    )

"""Merkle reconciliation: digest compare + bounded drill-down."""

import pyspark.sql.functions as F

from hermes_spark.operators.reconcile import drill_down, reconcile


def test_reconcile_clean_and_divergent(spark, transcripts_df):
    src = transcripts_df
    # identical → empty
    assert reconcile(src, src).count() == 0

    # corrupt one turn, drop one conversation, add one extra conv
    convs = [r.conv_id for r in src.select("conv_id").distinct().limit(3).collect()]
    c_mut, c_drop = convs[0], convs[1]
    tgt = src.where(F.col("conv_id") != c_drop)
    tgt = tgt.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == c_mut) & (F.col("turn_idx") == 1),
            F.lit("CORRUPTED"),
        ).otherwise(F.col("text")),
    )
    extra = src.where(F.col("conv_id") == c_drop).withColumn(
        "conv_id", F.lit("conv-extra")
    )
    tgt = tgt.unionByName(extra)

    r = {row.conv_id: row.status for row in reconcile(src, tgt).collect()}
    assert r[c_mut] == "mismatch"
    assert r[c_drop] == "missing_in_target"
    assert r["conv-extra"] == "extra_in_target"
    assert len(r) == 3

    dd = drill_down(src, tgt, reconcile(src, tgt).where(F.col("status") == "mismatch"))
    rows = dd.collect()
    assert len(rows) == 1
    assert (rows[0].conv_id, rows[0].turn_idx, rows[0].op) == (c_mut, 1, "update")

"""IcebergTable: jar-free tests — the MERGE statement generator is the
table's core logic; the catalog gate must fail loudly in this sandbox."""

import pytest
from pyspark.sql import types as T

from hermes_spark.iceberg import IcebergTable, merge_sql


def test_merge_sql_shape():
    sql = merge_sql(
        "cat.db.target", "chg", ["conv_id", "turn_idx"],
        ["conv_id", "turn_idx", "op", "text"],
    )
    assert "MERGE INTO cat.db.target t USING chg s" in sql
    assert "t.conv_id <=> s.conv_id AND t.turn_idx <=> s.turn_idx" in sql
    assert "WHEN MATCHED AND s.op = 'delete' THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.conv_id = s.conv_id" in sql
    assert (
        "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT "
        "(conv_id, turn_idx, op, text) VALUES "
        "(s.conv_id, s.turn_idx, s.op, s.text)" in sql
    )


def test_catalog_gate_raises_without_runtime(spark):
    schema = T.StructType([T.StructField("id", T.IntegerType())])
    with pytest.raises(RuntimeError, match="not configured"):
        IcebergTable(spark, "nocat.db.t", key=["id"], schema=schema)

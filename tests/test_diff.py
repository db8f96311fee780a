"""Snapshot-diff (J3) semantics — the reference's core operator.

Mirrors the unit coverage of
/root/reference/tests/unit/test_lib_datamodel_dataobjectlist.py
(diffFrom: added/removed/modified classification) re-expressed on
DataFrames.
"""

import pyspark.sql.functions as F
import pytest

from hermes_spark.operators.diff import snapshot_diff


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            ("c1", 0, "hello", "user"),
            ("c1", 1, "hi there", "assistant"),
            ("c2", 0, "bye", "user"),
            ("c3", 0, "keep", "user"),
        ],
        "conv_id string, turn_idx int, text string, role string",
    )
    new = spark.createDataFrame(
        [
            ("c1", 0, "hello", "user"),          # unchanged
            ("c1", 1, "hi there EDITED", "assistant"),  # modified
            ("c1", 2, "new turn", "user"),       # added
            ("c3", 0, "keep", "user"),           # unchanged
        ],
        "conv_id string, turn_idx int, text string, role string",
    )
    return new, old


def test_classification(spark, snaps):
    new, old = snaps
    d = snapshot_diff(new, old, key=["conv_id", "turn_idx"], compare_cols=["text", "role"])
    rows = {(r.conv_id, r.turn_idx): r.op for r in d.collect()}
    assert rows == {
        ("c1", 1): "update",
        ("c1", 2): "insert",
        ("c2", 0): "delete",
    }


def test_delete_carries_old_payload(spark, snaps):
    new, old = snaps
    d = snapshot_diff(new, old, key=["conv_id", "turn_idx"], compare_cols=["text", "role"])
    dele = d.where(F.col("op") == "delete").collect()[0]
    assert dele.text == "bye" and dele.cksum is None


def test_attr_level_diff(spark, snaps):
    new, old = snaps
    d = snapshot_diff(
        new, old, key=["conv_id", "turn_idx"], compare_cols=["text", "role"],
        emit_attr_diff=True,
    )
    upd = d.where(F.col("op") == "update").collect()[0]
    assert upd.changed_attrs == ["text"]


def test_null_vs_absent_distinct(spark):
    """NULL → value and value → NULL are both updates (absent-attr is a
    diffable state, reference dataobject.py:278)."""
    old = spark.createDataFrame([("a", 1, None), ("b", 1, "x")],
                                "conv_id string, turn_idx int, text string")
    new = spark.createDataFrame([("a", 1, "x"), ("b", 1, None)],
                                "conv_id string, turn_idx int, text string")
    d = snapshot_diff(new, old, key=["conv_id", "turn_idx"], compare_cols=["text"])
    assert {r.op for r in d.collect()} == {"update"}
    assert d.count() == 2


def test_idempotent_empty_diff(spark, snaps):
    new, _ = snaps
    assert snapshot_diff(new, new, ["conv_id", "turn_idx"], ["text", "role"]).count() == 0

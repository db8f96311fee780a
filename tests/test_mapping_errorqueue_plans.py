"""Attribute-mapping projection, column scoping, dead-letter drain,
and physical-plan assertions (pushdown / broadcast / pruning)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from hermes_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    scan_read_schema,
)
from hermes_spark.plans.mapping import (
    ColumnScopes,
    apply_mapping,
    required_columns,
)
from hermes_spark.streaming.errorqueue import DeadLetterQueue
from hermes_spark.tables import scratch_dir


@pytest.fixture(scope="module")
def remote(spark):
    return spark.createDataFrame(
        [("u1", "Ann", "X", None, "a@x", "s3cr3t"),
         ("u2", "Bob", None, "Y", "b@x", "hunter2")],
        "id string, name string, job1 string, job2 string, mail string, pw string",
    )


def test_mapping_forms(spark, remote):
    out = apply_mapping(
        remote,
        {
            "uid": "id",
            "jobs": ["job1", "job2"],
            "display": {"expr": "concat(name, ' <', mail, '>')"},
        },
    )
    rows = {r.uid: r for r in out.collect()}
    assert rows["u1"].jobs == ["X"]         # nulls dropped (P3)
    assert rows["u2"].jobs == ["Y"]
    assert rows["u1"].display == "Ann <a@x>"


def test_required_columns(spark, remote):
    req = required_columns(
        remote,
        {"uid": "id", "jobs": ["job1", "job2"], "d": {"expr": "upper(name)"}},
    )
    assert req == {"id", "job1", "job2", "name"}


def test_column_scopes(spark, remote):
    scopes = ColumnScopes(secrets=("pw",), local_only=("mail",), key=("id",))
    assert "pw" in scopes.event_columns(remote)       # secrets DO go to events
    assert "mail" not in scopes.event_columns(remote)
    assert "pw" not in scopes.cache_columns(remote)   # never cached
    assert "pw" not in scopes.diff_columns(remote)
    masked = scopes.masked_for_log(remote).collect()[0]
    assert masked.pw == "<secret>" and masked.name == "Ann"


def test_dead_letter_drain_with_dependencies(spark):
    """Parent key blocked while a child error references it; drain
    resolves children first, then parents (reference multi-pass
    dependency-order drain)."""
    payload = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("v", T.StringType()),
         T.StructField("fk", T.StringType())]
    )
    dlq = DeadLetterQueue(
        spark, scratch_dir("dlq"), key=["key"], payload_schema=payload,
        fk_map=[("key", "fk")],
    )
    failed = spark.createDataFrame(
        [("p1", "x", None, 1, "update", "boom"),
         ("c1", "y", "p1", 2, "update", "boom"),
         ("p2", "z", None, 3, "insert", "boom")],
        "key string, v string, fk string, offset long, op string, err string",
    )
    dlq.enqueue(failed, autoremediate=False)

    # pass 1 candidates: c1 (child) and p2; p1 is blocked by c1
    c = {r.key for r in dlq.retry_candidates().collect()}
    assert c == {"c1", "p2"}

    applied = []

    def apply_fn(df):
        rows = df.collect()
        applied.append({r.key for r in rows})
        return spark.createDataFrame([(r.key,) for r in rows], "key string")

    remaining = dlq.drain(apply_fn)
    assert remaining == 0
    assert applied[0] == {"c1", "p2"}
    assert applied[1] == {"p1"}  # unblocked after child resolved


def test_enqueue_compaction(spark):
    payload = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("v", T.StringType())]
    )
    dlq = DeadLetterQueue(spark, scratch_dir("dlq2"), key=["key"], payload_schema=payload)
    dlq.enqueue(spark.createDataFrame(
        [("k", "v1", 1, "insert", "e1")],
        "key string, v string, offset long, op string, err string"), autoremediate=False)
    # a later delete for the same key annihilates the queued insert
    dlq.enqueue(spark.createDataFrame(
        [("k", None, 2, "delete", "e2")],
        "key string, v string, offset long, op string, err string"))
    assert dlq.read().count() == 0


# --- plan assertions --------------------------------------------------------

def test_filter_pushdown_and_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") < "1995-01-01").select("l_orderkey", "l_quantity")
    assert_pushed_filters(q)
    schemas = scan_read_schema(q)
    assert schemas and all("l_extendedprice" not in s for s in schemas)


def test_star_join_broadcasts_dims(spark, sf_dir):
    import __spark_entry__ as em

    q = em.queries()["star_join"](spark, sf_dir)
    assert_broadcast_join(q)

"""Error-queue fidelity (round-2 verdict item #3): the enqueue-time
foreignkeys_policy matrix, err/step survival through field-level
autoremediation, partially-processed exclusion from the field-level
fold, and MERGE-delta (O(affected)) queue writes."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hermes_spark.streaming.errorqueue import DeadLetterQueue
from hermes_spark.tables import scratch_dir

PAYLOAD = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("fk", T.StringType(), True),
    ]
)

Q = "key string, v string, fk string, offset long, op string, err string"

MAPT = T.MapType(T.StringType(), T.StringType())


def _dlq(spark, policy="disabled", **kw):
    return DeadLetterQueue(
        spark, scratch_dir("dlqpol"), key=["key"], payload_schema=PAYLOAD,
        fk_map=[("key", "fk")], foreignkeys_policy=policy, **kw,
    )


@pytest.mark.parametrize(
    "policy,expect_gated",
    [
        # child c1 (fk→p1) is queued; incoming events for parent p1:
        # update@9 then delete@10.  per-key FIFO gates nothing here
        # (p1 not queued); the FK policy decides.  Order-faithful: the
        # pre-divert update@9 processes under on_remove_event, and
        # everything from the first diverted event onward gates.
        ("disabled", set()),
        ("on_remove_event", {("p1", "delete")}),
        ("on_every_event", {("p1", "delete"), ("p1", "update")}),
    ],
)
def test_fk_policy_matrix(spark, policy, expect_gated):
    """The reference's foreignkeys_policy knob
    (clients/__init__.py:133-141, applied at :1020): which event types
    divert to the queue when their object FK-parents an errored one."""
    dlq = _dlq(spark, policy)
    dlq.enqueue(
        spark.createDataFrame([("c1", "y", "p1", 1, "update", "boom")], Q),
        autoremediate=False,
    )
    incoming = spark.createDataFrame(
        [
            ("p1", "b", None, 9, "update", None),
            ("p1", "a", None, 10, "delete", None),
            ("z9", "c", None, 12, "delete", None),  # unrelated key
        ],
        Q,
    )
    process, gated = dlq.gate_incoming(incoming)
    got = {(r.key, r.op) for r in gated.collect()}
    assert got == expect_gated
    assert {(r.key, r.op) for r in process.collect()} == {
        ("p1", "delete"), ("p1", "update"), ("z9", "delete")
    } - expect_gated


def test_per_key_fifo_always_gates(spark):
    """Regardless of FK policy, an event whose own key already has
    queued events diverts (processing it would reorder the key)."""
    dlq = _dlq(spark, "disabled")
    dlq.enqueue(
        spark.createDataFrame([("k1", "x", None, 1, "update", "boom")], Q),
        autoremediate=False,
    )
    incoming = spark.createDataFrame(
        [("k1", "y", None, 5, "update", None), ("k2", "z", None, 6, "insert", None)],
        Q,
    )
    process, gated = dlq.gate_incoming(incoming)
    assert {r.key for r in gated.collect()} == {"k1"}
    assert {r.key for r in process.collect()} == {"k2"}


def test_field_level_keeps_err_and_step(spark, tmp_work):
    """The merged queue entry keeps the newest error text and step
    (reference errorqueue.py:463-501) — round 2 nulled them."""
    payload = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("attrs", MAPT, True),
            T.StructField("added", MAPT, True),
            T.StructField("modified", MAPT, True),
            T.StructField("removed", MAPT, True),
        ]
    )
    qs = T.StructType(
        list(payload.fields)
        + [
            T.StructField("offset", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("err", T.StringType(), True),
            T.StructField("step", T.IntegerType(), True),
        ]
    )
    dlq = DeadLetterQueue(spark, tmp_work + "/dlq", key=["k"], payload_schema=payload)
    dlq.enqueue(
        spark.createDataFrame(
            [("x", {"cn": "a"}, None, None, None, 1, "added", "boom1", 2)], qs
        ),
        field_level=True,
    )
    dlq.enqueue(
        spark.createDataFrame(
            [("x", None, None, {"cn": "b"}, None, 2, "modified", "boom2", 3)], qs
        ),
        field_level=True,
    )
    rows = dlq.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.op == "added" and dict(r.attrs) == {"cn": "b"}
    assert r.err == "boom2" and r.step == 3


def test_field_level_partially_processed_passthrough(spark, tmp_work):
    """A key holding a partially-processed event is NOT compacted —
    the reference refuses to merge such events (errorqueue.py:437-460).
    The op-level path already honored this; field-level must too."""
    payload = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("attrs", MAPT, True),
            T.StructField("added", MAPT, True),
            T.StructField("modified", MAPT, True),
            T.StructField("removed", MAPT, True),
        ]
    )
    qs = T.StructType(
        list(payload.fields)
        + [
            T.StructField("offset", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("err", T.StringType(), True),
            T.StructField("partially_processed", T.BooleanType(), True),
        ]
    )
    dlq = DeadLetterQueue(spark, tmp_work + "/dlq2", key=["k"], payload_schema=payload)
    dlq.enqueue(
        spark.createDataFrame(
            [("x", {"cn": "a"}, None, None, None, 1, "added", "e1", True)], qs
        ),
        field_level=True,
    )
    dlq.enqueue(
        spark.createDataFrame(
            [("x", None, None, {"cn": "b"}, None, 2, "modified", "e2", False)], qs
        ),
        field_level=True,
    )
    rows = sorted(dlq.read().collect(), key=lambda r: r.offset)
    # both events retained verbatim — no fold across a pp event
    assert [(r.offset, r.op) for r in rows] == [(1, "added"), (2, "modified")]
    assert rows[0].partially_processed is True


def test_queue_writes_are_merge_deltas(spark):
    """enqueue/resolve never rewrite the queue: every commit is a
    delta (O(affected)), with compaction strictly out-of-band."""
    dlq = _dlq(spark)
    for i in range(10):
        dlq.enqueue(
            spark.createDataFrame([(f"k{i}", "v", None, i, "update", "e")], Q),
            autoremediate=True,
        )
    ok = spark.createDataFrame([("k3",)], "key string")
    dlq.resolve(ok)
    kinds = {c["kind"] for c in dlq.table._read_commits()}
    assert kinds == {"delta"}
    assert dlq.read().count() == 9
    dlq.maintain()  # out-of-band fold
    assert dlq.read().count() == 9
    # delete-events survive maintenance (op is the EVENT op, not row
    # liveness — regression guard for the _qop channel)
    dlq.enqueue(
        spark.createDataFrame([("kd", None, None, 99, "delete", "e")], Q),
        autoremediate=False,
    )
    dlq.maintain()
    assert dlq.read().where("key = 'kd'").count() == 1


def test_gate_incoming_matches_sequential_model(spark):
    """Property check: the set-based gate must equal the reference's
    sequential loop (process events in offset order; divert an event if
    its key is queued OR it FK-parents a queued object with its op in
    the policy set; once a key's event diverts, the key counts as
    queued for the rest of the batch)."""
    import itertools
    import random

    rng = random.Random(11)
    keys = ["k1", "k2", "k3", "k4"]
    ops = ["insert", "update", "delete"]
    for trial in range(6):
        policy = ["disabled", "on_remove_event", "on_every_event"][trial % 3]
        # queued state: random subset of keys, random fk references
        queued = [
            (k, f"v{i}", rng.choice(keys + [None]), i, rng.choice(ops), "e")
            for i, k in enumerate(rng.sample(keys, rng.randint(0, 2)))
        ]
        incoming = [
            (rng.choice(keys), f"n{j}", None, 100 + j, rng.choice(ops), None)
            for j in range(8)
        ]
        dlq = _dlq(spark, policy)
        if queued:
            dlq.enqueue(spark.createDataFrame(queued, Q), autoremediate=False)

        process, gated = dlq.gate_incoming(spark.createDataFrame(incoming, Q))
        got_gated = {(r.key, r.offset) for r in gated.collect()}
        got_process = {(r.key, r.offset) for r in process.collect()}

        # sequential model
        from hermes_spark.streaming.errorqueue import FOREIGNKEYS_POLICIES
        kinds = set(FOREIGNKEYS_POLICIES[policy])
        qkeys = {q[0] for q in queued}
        child_refs = {q[2] for q in queued if q[2] is not None}
        want_gated = set()
        for key, _v, _fk, off, op, _e in sorted(incoming, key=lambda r: r[3]):
            if key in qkeys or (key in child_refs and op in kinds):
                want_gated.add((key, off))
                qkeys.add(key)
        want_process = {(r[0], r[3]) for r in incoming} - want_gated
        assert got_gated == want_gated, (trial, policy, got_gated, want_gated)
        assert got_process == want_process, (trial, policy)

"""Field-level event merge vs a Python model of the reference's
``_mergeEvents`` truth table (/root/reference/clients/errorqueue.py:
187-417), including the field-level modified+modified rules and the
removed+added → modified(diff vs cache) case."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermes_spark.operators.eventmerge import compact_events_map

MAPT = T.MapType(T.StringType(), T.StringType())
EV_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("attrs", MAPT, True),
        T.StructField("added", MAPT, True),
        T.StructField("modified", MAPT, True),
        T.StructField("removed", MAPT, True),
    ]
)
PRIOR_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("attrs", MAPT, True),
    ]
)


# ---- python model of the reference fold -----------------------------------

def model_fold(events: list[dict], prior: dict | None):
    """(op, attrs, added, modified, removed) or None — mirrors
    errorqueue.py pairwise merging applied along the run."""
    st, flat, a, m, r = "empty", {}, {}, {}, {}
    for e in events:
        t = e["op"]
        fa = e.get("attrs") or {}
        la, lm, lr = e.get("added") or {}, e.get("modified") or {}, e.get("removed") or {}
        if st in ("empty", "annihilated"):
            if t == "added":
                st, flat = "added", dict(fa)
            elif t == "modified":
                st, a, m, r = "modified", dict(la), dict(lm), dict(lr)
            else:
                st = "removed"
        elif st in ("added", "readded"):
            if t == "modified":              # ref :237-252
                flat.update(la)
                flat.update(lm)
                for kk in list(flat.keys() & lr.keys()):
                    del flat[kk]
            elif t == "removed":             # ref :253-258
                st = "annihilated" if st == "added" else "removed"
                flat = {}
            else:                            # invalid: later event wins
                st, flat = "added", dict(fa)
        elif st == "modified":
            if t == "modified":              # ref :348-399
                for kk, v in la.items():
                    a[kk] = v
                    r.pop(kk, None)
                for kk, v in lm.items():
                    if kk in a:
                        a[kk] = v
                    else:
                        m[kk] = v
                for kk, v in lr.items():
                    if kk in a:
                        del a[kk]
                    else:
                        m.pop(kk, None)
                        r[kk] = v
            elif t == "removed":             # ref :400-409
                st, a, m, r = "removed", {}, {}, {}
            else:
                st, flat, a, m, r = "added", dict(fa), {}, {}, {}
        elif st == "removed":
            if t == "added":                 # ref :259-347
                st, flat = "readded", dict(fa)
            elif t == "modified":
                st, a, m, r = "modified", dict(la), dict(lm), dict(lr)
            else:
                st = "removed"
    if st == "added":
        return ("added", flat, {}, {}, {})
    if st == "modified":
        return ("modified", {}, a, m, r)
    if st == "removed":
        return ("removed", {}, {}, {}, {})
    if st == "readded":
        if prior is None:
            return ("added", flat, {}, {}, {})
        d_add = {k: v for k, v in flat.items() if k not in prior}
        d_mod = {k: v for k, v in flat.items() if k in prior and prior[k] != v}
        d_rem = {k: v for k, v in prior.items() if k not in flat}
        if not (d_add or d_mod or d_rem):
            return None                       # empty diff ignored (:333-347)
        return ("modified", {}, d_add, d_mod, d_rem)
    return None                               # empty / annihilated


# ---- generators ------------------------------------------------------------

ATTRS = ["cn", "mail", "uid", "dept"]


def rand_map(rng, lo=0, hi=3):
    ks = rng.sample(ATTRS, rng.randint(lo, hi))
    return {k: f"v{rng.randint(0, 3)}" for k in ks}


def rand_event(rng, op):
    if op == "added":
        return {"op": op, "attrs": rand_map(rng, 1, 4)}
    if op == "modified":
        ks = ATTRS[:]
        rng.shuffle(ks)
        return {
            "op": op,
            "added": {k: f"v{rng.randint(0, 3)}" for k in ks[0:1] if rng.random() < 0.8},
            "modified": {k: f"v{rng.randint(0, 3)}" for k in ks[1:2] if rng.random() < 0.8},
            "removed": {k: f"v{rng.randint(0, 3)}" for k in ks[2:3] if rng.random() < 0.8},
        }
    return {"op": op}


def valid_next(st):
    """Ops the reference considers legal after state st."""
    return {
        "empty": ["added", "modified", "removed"],
        "annihilated": ["added", "modified", "removed"],
        "added": ["modified", "removed"],
        "readded": ["modified", "removed"],
        "modified": ["modified", "removed"],
        "removed": ["added"],
    }[st]


def advance(st, op):
    if st in ("empty", "annihilated"):
        return {"added": "added", "modified": "modified", "removed": "removed"}[op]
    if st in ("added", "readded"):
        if op == "modified":
            return st
        return "annihilated" if st == "added" else "removed"
    if st == "modified":
        return "modified" if op == "modified" else "removed"
    if st == "removed":
        return "readded"
    raise AssertionError(st)


def gen_run(rng, n):
    st, evs = "empty", []
    for _ in range(n):
        op = rng.choice(valid_next(st))
        evs.append(rand_event(rng, op))
        st = advance(st, op)
    return evs


@pytest.fixture(scope="module")
def cases():
    rng = random.Random(20260816)
    runs = {}
    for i in range(120):
        runs[f"k{i:03d}"] = gen_run(rng, rng.randint(1, 6))
    priors = {
        k: rand_map(rng, 1, 4) if rng.random() < 0.7 else None for k in runs
    }
    return runs, priors


def _collect(df):
    out = {}
    for row in df.collect():
        out[row["k"]] = (
            row["op"],
            dict(row["attrs"] or {}),
            dict(row["added"] or {}),
            dict(row["modified"] or {}),
            dict(row["removed"] or {}),
        )
    return out


def test_compact_events_map_matches_reference_model(spark, cases):
    runs, priors = cases
    rows = []
    for k, evs in runs.items():
        for off, e in enumerate(evs):
            rows.append(
                (k, off, e["op"], e.get("attrs"), e.get("added"),
                 e.get("modified"), e.get("removed"))
            )
    events = spark.createDataFrame(rows, EV_SCHEMA)
    prior = spark.createDataFrame(
        [(k, p) for k, p in priors.items() if p is not None], PRIOR_SCHEMA
    )
    got = _collect(compact_events_map(events, key=["k"], prior=prior))

    want = {}
    for k, evs in runs.items():
        res = model_fold(evs, priors[k])
        if res is not None:
            want[k] = res

    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, runs[k], priors[k], got[k], want[k])


def test_pairwise_reference_table_explicit(spark):
    """The five documented pairs, attribute-for-attribute."""
    mk = lambda *a: a  # noqa: E731
    rows = [
        # added + modified → added w/ merged attrs (ref :237-252)
        mk("p1", 0, "added", {"cn": "x", "mail": "m"}, None, None, None),
        mk("p1", 1, "modified", None, {"uid": "7"}, {"cn": "y"}, {"mail": "m"}),
        # added + removed → annihilate (ref :253-258)
        mk("p2", 0, "added", {"cn": "x"}, None, None, None),
        mk("p2", 1, "removed", None, None, None, None),
        # removed + added → modified(diff vs prior) (ref :259-347)
        mk("p3", 0, "removed", None, None, None, None),
        mk("p3", 1, "added", {"cn": "new", "uid": "7"}, None, None, None),
        # modified + modified → field-level merge (ref :348-399)
        mk("p4", 0, "modified", None, {"a1": "1"}, {"cn": "x"}, {"mail": "m"}),
        mk("p4", 1, "modified", None, {"mail": "m2"}, {"a1": "2"}, {"cn": "x"}),
        # modified + removed → removed (ref :400-409)
        mk("p5", 0, "modified", None, None, {"cn": "x"}, None),
        mk("p5", 1, "removed", None, None, None, None),
    ]
    events = spark.createDataFrame(rows, EV_SCHEMA)
    prior = spark.createDataFrame(
        [("p3", {"cn": "old", "mail": "m"})], PRIOR_SCHEMA
    )
    got = _collect(compact_events_map(events, key=["k"], prior=prior))

    assert got["p1"] == ("added", {"cn": "y", "uid": "7"}, {}, {}, {})
    assert "p2" not in got
    assert got["p3"] == (
        "modified", {}, {"uid": "7"}, {"cn": "new"}, {"mail": "m"},
    )
    # p4: last.added mail→added(m2) + mail leaves removed; last.modified a1
    # is in added → added a1=2; last.removed cn was modified → removed cn
    assert got["p4"] == (
        "modified", {}, {"a1": "2", "mail": "m2"}, {}, {"cn": "x"},
    )
    assert got["p5"] == ("removed", {}, {}, {}, {})


def test_dlq_field_level_autoremediation(spark, tmp_work):
    """DeadLetterQueue.enqueue(field_level=True): a queued added event
    and a late-arriving modified event for the same key fold into ONE
    added event with field-merged attrs (ref errorqueue.py:237-252)."""
    from hermes_spark.streaming.errorqueue import DeadLetterQueue

    payload = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("attrs", MAPT, True),
            T.StructField("added", MAPT, True),
            T.StructField("modified", MAPT, True),
            T.StructField("removed", MAPT, True),
        ]
    )
    dlq = DeadLetterQueue(spark, tmp_work + "/dlq", key=["k"], payload_schema=payload)
    q_schema = T.StructType(
        list(payload.fields)
        + [
            T.StructField("offset", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("err", T.StringType(), True),
        ]
    )
    first = spark.createDataFrame(
        [("x", {"cn": "a", "mail": "m"}, None, None, None, 1, "added", "boom")],
        q_schema,
    )
    dlq.enqueue(first, field_level=True)
    second = spark.createDataFrame(
        [("x", None, {"uid": "7"}, {"cn": "b"}, {"mail": "m"}, 2, "modified", "boom2")],
        q_schema,
    )
    dlq.enqueue(second, field_level=True)

    rows = dlq.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["op"] == "added" and dict(r["attrs"]) == {"cn": "b", "uid": "7"}

    # added + removed annihilates: the key leaves the queue entirely
    third = spark.createDataFrame(
        [("x", None, None, None, None, 3, "removed", "boom3")], q_schema
    )
    dlq.enqueue(third, field_level=True)
    assert dlq.read().count() == 0

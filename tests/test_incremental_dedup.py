"""Incremental MinHash dedup against the persisted signature store
(functions/incremental.py): first-arrival-wins across batches,
keep-smallest within a batch, effectively-once store commits."""

from __future__ import annotations

import os

import pytest

from hermes_spark.functions.incremental import (
    incremental_minhash_dedup,
    signature_store,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
    "mu nu xi omicron pi rho sigma tau upsilon"
)
# one-token tail edit: J = 18/19 ≈ 0.95, far above both the 0.8
# estimator cut and the 8-band miss probability for ANY hash family
# (the pair must not sit near the operating point — the property test
# owns borderline behavior)
NEAR = BASE + " omega"
OTHER = "one two three four five six seven eight nine ten eleven twelve"


def test_incremental_dedup_across_batches(spark, tmp_work):
    store = os.path.join(tmp_work, "sigstore")

    # batch A: an internal exact-dup pair + a unique doc
    a = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    surv_a = incremental_minhash_dedup(spark, a, store)
    assert sorted(r.doc_id for r in surv_a.collect()) == [1, 3]

    # batch B: near-copy of stored doc 1 (drop), exact copy of stored
    # doc 3 (drop), internal pair (11 kept, 12 dropped), one unique
    b = _docs(
        spark,
        [
            (10, NEAR),
            (11, "unrelated words entirely fresh content here today"),
            (12, "unrelated words entirely fresh content here today"),
            (13, OTHER),
        ],
    )
    surv_b = incremental_minhash_dedup(spark, b, store)
    assert sorted(r.doc_id for r in surv_b.collect()) == [11]

    # the store holds exactly the survivors' signatures
    from pyspark.sql import types as T

    st = signature_store(
        spark, store, T.StructField("doc_id", T.LongType(), True)
    )
    assert sorted(
        r.doc_id for r in st.read(op_col=None).select("doc_id").collect()
    ) == [1, 3, 11]


def test_incremental_dedup_replay_is_noop(spark, tmp_work):
    from pyspark.sql import types as T

    store = os.path.join(tmp_work, "sigstore2")
    a = _docs(spark, [(1, BASE), (2, OTHER)])
    incremental_minhash_dedup(spark, a, store)
    st = signature_store(
        spark, store, T.StructField("doc_id", T.LongType(), True)
    )
    v1 = st.current_version()

    # exact replay: same survivors, NO new store commit
    surv = incremental_minhash_dedup(spark, a, store)
    assert sorted(r.doc_id for r in surv.collect()) == [1, 2]
    st2 = signature_store(
        spark, store, T.StructField("doc_id", T.LongType(), True)
    )
    assert st2.current_version() == v1


def test_incremental_equals_one_shot_on_union(spark, tmp_work):
    """Feeding A then B incrementally keeps the same id set as the
    batch keep-smallest dedup over A ∪ B (ids arrive in order here,
    so first-arrival == keep-smallest)."""
    from hermes_spark.functions.dedup import minhash_dedup_pairs

    rows_a = [(1, BASE), (2, BASE), (3, OTHER)]
    rows_b = [(10, NEAR), (11, "fresh unseen sentence with many new tokens"),
              (13, OTHER)]
    store = os.path.join(tmp_work, "sigstore3")
    s1 = incremental_minhash_dedup(spark, _docs(spark, rows_a), store)
    s2 = incremental_minhash_dedup(spark, _docs(spark, rows_b), store)
    inc_ids = sorted(
        [r.doc_id for r in s1.collect()] + [r.doc_id for r in s2.collect()]
    )

    both = _docs(spark, rows_a + rows_b)
    pairs = minhash_dedup_pairs(both, verify_threshold=None)
    # estimator-vs-exact nuance doesn't bite here: candidates are
    # either identical or high-overlap; apply the same estimator cut
    from hermes_spark.functions.incremental import estimated_jaccard
    from hermes_spark.functions.dedup import minhash_signatures
    from pyspark.sql import functions as F

    sigs = minhash_signatures(both)
    est_pairs = (
        pairs.join(sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .where(estimated_jaccard(64) >= 0.8)
        .select("doc_a", "doc_b")
    )
    losers = {r.doc_b for r in est_pairs.collect()}
    one_shot = sorted(
        i for i, _ in rows_a + rows_b if i not in losers
    )
    assert inc_ids == one_shot


def test_incremental_dedup_rejects_bad_bands(spark, tmp_work):
    with pytest.raises(ValueError, match="divide"):
        incremental_minhash_dedup(
            spark, _docs(spark, [(1, BASE)]),
            os.path.join(tmp_work, "s"), bands=7,
        )


# -- property: arrival-order model ------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VOCAB = ["red", "blue", "green", "gold", "iron", "wolf", "moon", "star"]


@st.composite
def _batches(draw):
    """2-3 batches of short docs over a tiny vocab — collisions are
    the point.  Ids are globally unique and increase with arrival."""
    n_batches = draw(st.integers(2, 3))
    out, next_id = [], 0
    for _ in range(n_batches):
        n = draw(st.integers(1, 5))
        rows = []
        for _ in range(n):
            toks = draw(
                st.lists(st.sampled_from(_VOCAB), min_size=4, max_size=7)
            )
            rows.append((next_id, " ".join(toks)))
            next_id += 1
        out.append(rows)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_batches())
def test_incremental_matches_arrival_order_model(spark, tmp_path_factory, data):
    """Incremental survivors == the explicit arrival-order fold of the
    GLOBAL estimator pair set: a doc is dropped iff it est-matches a
    smaller-id doc in its own batch, or a KEPT doc from an earlier
    batch (dropped docs leave no signature)."""
    import pyspark.sql.functions as F

    from hermes_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from hermes_spark.functions.incremental import estimated_jaccard

    store = str(tmp_path_factory.mktemp("propstore"))
    all_rows = [r for batch in data for r in batch]
    both = _docs(spark, all_rows)

    # the operator's exact pair relation: shares a band (candidacy is
    # batch-independent — banding a signature ignores which frame it
    # sits in) AND estimator >= threshold
    sigs = minhash_signatures(both)
    cands = lsh_candidate_pairs(sigs, bands=8)  # the operator's default
    pairs = {
        (r.doc_a, r.doc_b)
        for r in cands.join(
            sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id")
        )
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .where(estimated_jaccard(64) >= 0.8)
        .select("doc_a", "doc_b")
        .collect()
    }

    def matches(i, j):
        return (min(i, j), max(i, j)) in pairs

    kept: list[int] = []
    expected = []
    for batch in data:
        ids = [i for i, _ in batch]
        for i in ids:
            same_batch_smaller = any(matches(i, j) for j in ids if j < i)
            vs_kept = any(matches(i, k) for k in kept)
            if not same_batch_smaller and not vs_kept:
                expected.append(i)
        kept = list(expected)

    got = []
    for batch in data:
        surv = incremental_minhash_dedup(spark, _docs(spark, batch), store)
        got.extend(r.doc_id for r in surv.collect())
    assert sorted(got) == sorted(expected)


def test_redelivery_with_changed_text_recommits(spark, tmp_work):
    """The content-stable batch id hashes (id, signature) — same ids
    with CHANGED text is NOT a replay: the store re-commits and
    upserts the fresh signatures (MERGE on id)."""
    from pyspark.sql import types as T

    store = os.path.join(tmp_work, "sigstore4")
    incremental_minhash_dedup(spark, _docs(spark, [(1, BASE)]), store)
    st = signature_store(
        spark, store, T.StructField("doc_id", T.LongType(), True)
    )
    v1 = st.current_version()

    # corrected content under the same id
    surv = incremental_minhash_dedup(spark, _docs(spark, [(1, OTHER)]), store)
    assert [r.doc_id for r in surv.collect()] == [1]
    st2 = signature_store(
        spark, store, T.StructField("doc_id", T.LongType(), True)
    )
    assert st2.current_version() > v1
    # store now matches the NEW content: a future near-copy of the
    # new text is dropped, the old text no longer blocks
    surv2 = incremental_minhash_dedup(
        spark, _docs(spark, [(7, OTHER), (8, BASE)]), store
    )
    assert sorted(r.doc_id for r in surv2.collect()) == [8]


def test_signature_store_family_marker(spark, tmp_work):
    """A store written by a different hash family is refused loudly —
    mismatched signatures would otherwise silently stop matching."""
    import json as _json

    store = os.path.join(tmp_work, "sigstore5")
    incremental_minhash_dedup(spark, _docs(spark, [(1, BASE)]), store)
    marker = os.path.join(store, "_sig_family.json")
    from hermes_spark.functions.incremental import SIG_FAMILY

    assert _json.load(open(marker))["family"] == SIG_FAMILY

    with open(marker, "w") as f:
        _json.dump({"family": "minhash-legacy-v1"}, f)
    with pytest.raises(ValueError, match="hash family"):
        incremental_minhash_dedup(spark, _docs(spark, [(2, OTHER)]), store)

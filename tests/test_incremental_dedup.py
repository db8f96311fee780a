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


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = BASE + " lambda"  # high-overlap tail edit
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

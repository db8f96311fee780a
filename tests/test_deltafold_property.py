"""Property-based test of the merge-on-read fold under leveled
incremental compaction.

``compact_deltas`` is new core table machinery (round 5): random merge
sequences with interleaved maintenance actions (suffix folds with a
tiny ``max_folds`` so consolidation triggers often, full compacts,
generation-windowed vacuums) must leave ``read()`` equal to a
sequential python dict model — state independent of WHERE the fold
boundaries landed.  Runs on the extra-op-channel table shape (no ``op``
in the schema), the trickier liveness path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from hermes_spark.tables import ParquetMergeTable, scratch_dir

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)
DDL = "id int, v string, op string"

merge_batch = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["insert", "update", "delete"])),
    min_size=1,
    max_size=3,
    unique_by=lambda kv: kv[0],  # MERGE contract: one row per key
)
action = st.one_of(
    st.tuples(st.just("merge"), merge_batch),
    st.tuples(st.just("fold"), st.just(None)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("vacuum"), st.sampled_from([0, 1])),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(actions=st.lists(action, min_size=3, max_size=10))
def test_leveled_fold_state_equals_model(spark, actions):
    work = scratch_dir("foldprop")
    t = ParquetMergeTable(
        spark, work + "/t", key=["id"], schema=SCHEMA, compact_every=None
    )
    model: dict[int, str] = {}
    seq = 0
    for kind, arg in actions:
        if kind == "merge":
            rows = [(k, f"v{seq}-{k}", op) for k, op in arg]
            t.merge(spark.createDataFrame(rows, DDL), batch_id=seq)
            for k, op in arg:
                if op == "delete":
                    model.pop(k, None)
                else:
                    model[k] = f"v{seq}-{k}"
            seq += 1
        elif kind == "fold":
            t.compact_deltas(max_folds=2)  # tiny cap: consolidations trigger
        elif kind == "compact":
            t.compact()
        else:
            t.vacuum(retain_superseded=arg)
    got = {r.id: r.v for r in t.read().collect()}
    assert got == model, (got, model, actions)
    t.drop()

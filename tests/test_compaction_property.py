"""Property-based test of the event-compaction truth table.

The reference's most intricate semantics (autoremediation pairwise
merges, /root/reference/clients/errorqueue.py:187-417, exhaustively
unit-tested there in test_clients_errorqueue.py) collapse, for a
totally ordered run of events on one key, to first/last-state
classification.  Hypothesis drives random op sequences against a
sequential python model and asserts the set-based Spark operator
agrees — a test layer the reference itself lacks (SURVEY.md §5).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hermes_spark.operators.compaction import compact_events

OPS = ["insert", "update", "delete"]


def model_compact(ops: list[str]) -> str | None:
    """Reference model: classify the run by (first_op, last_op),
    assuming the run is consistent with some prior state."""
    first, last = ops[0], ops[-1]
    if first == "insert" and last == "delete":
        return None
    if first == "insert":
        return "insert"
    if last == "delete":
        return "delete"
    return "update"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    runs=st.lists(
        st.lists(st.sampled_from(OPS), min_size=1, max_size=6),
        min_size=1,
        max_size=4,
    )
)
def test_compaction_matches_model(spark, runs):
    rows = []
    expected = {}
    for k, ops in enumerate(runs):
        key = f"k{k}"
        rows += [(key, i, op) for i, op in enumerate(ops)]
        expected[key] = model_compact(ops)
    df = spark.createDataFrame(rows, "key string, offset long, op string")
    got = {r.key: r.op for r in compact_events(df, ["key"], offset_col="offset").collect()}
    for key, exp in expected.items():
        assert got.get(key) == exp, (key, runs, got)

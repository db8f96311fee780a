"""Property-based test of the cached fan-out re-render.

The reference re-renders partial `modified` events against the full
cached object and re-classifies every rendered attr vs the local cache
(/root/reference/clients/datamodel.py:550-596, clients/__init__.py:
983-994) — its scenario tests walk hand-written step sequences.  Here
hypothesis drives random (events, cache) worlds against a row-wise
python model of exactly those semantics and asserts the set-based
Spark operator agrees attr-for-attr — a test layer the reference
lacks (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hermes_spark.plans.mapping import LocalTypeSpec, fanout_events

PAYLOAD = ["r1", "r2"]
# the mapping language under test: plain column + a null-propagating
# two-var template (mirrors Spark `concat`, which is null-if-any-null)
TYPES = {
    "flat": {"a1": "r1", "a2": "r2"},
    "tmpl": {"a1": {"expr": "concat(r1, ':', r2)"}, "a2": "r2"},
}

_val = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
_op = st.sampled_from(["insert", "update", "delete"])


def _render(mapping, src: dict | None) -> dict:
    out = {}
    for attr, spec in mapping.items():
        if src is None:
            out[attr] = None
        elif isinstance(spec, str):
            out[attr] = src.get(spec)
        else:  # the concat template
            x, y = src.get("r1"), src.get("r2")
            out[attr] = None if x is None or y is None else f"{x}:{y}"
    return out


def model_fanout(events, cache):
    """Row-wise reference model (the reference's per-event loop)."""
    out = {t: [] for t in TYPES}
    for k, op, r1, r2 in events:
        c = cache.get(k)
        ev = {"r1": r1, "r2": r2}
        if op == "update":
            eff = {p: (ev[p] if ev[p] is not None else (c or {}).get(p))
                   for p in PAYLOAD}
        else:
            eff = ev
        for t, mapping in TYPES.items():
            attrs = sorted(mapping)
            new = _render(mapping, eff)
            old = _render(mapping, c)
            if op == "delete":
                added, modified, removed = [], [], []
                keep = True
            elif op == "insert":
                added = [a for a in attrs if new[a] is not None]
                modified, removed = [], []
                keep = bool(added)
            else:
                added = [a for a in attrs if old[a] is None and new[a] is not None]
                modified = [
                    a for a in attrs
                    if old[a] is not None and new[a] is not None and old[a] != new[a]
                ]
                removed = [a for a in attrs if old[a] is not None and new[a] is None]
                keep = bool(added or modified or removed)
            if keep:
                out[t].append(
                    (k, op, new["a1"], new["a2"],
                     tuple(added), tuple(modified), tuple(removed))
                )
    return {t: sorted(rows, key=repr) for t, rows in out.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 4), _op, _val, _val), min_size=1, max_size=8
    ),
    cache=st.dictionaries(
        st.integers(0, 4), st.tuples(_val, _val), max_size=5
    ),
)
def test_cached_fanout_matches_row_model(spark, events, cache):
    ev_df = spark.createDataFrame(
        [(k, op, r1, r2) for k, op, r1, r2 in events],
        "k int, op string, r1 string, r2 string",
    )
    cache_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in cache.items()] or [(99, None, None)],
        "k int, r1 string, r2 string",
    )
    cache_model = {k: {"r1": v[0], "r2": v[1]} for k, v in cache.items()}
    if not cache:
        cache_model[99] = {"r1": None, "r2": None}
    out = fanout_events(
        ev_df,
        [LocalTypeSpec(t, m) for t, m in TYPES.items()],
        key_cols=["k"],
        passthrough=(),
        cache=cache_df,
    )
    got = {
        t: sorted(
            (
                (r.k, r.op, r.a1, r.a2,
                 tuple(r.attrs_added), tuple(r.attrs_modified),
                 tuple(r.attrs_removed))
                for r in df.collect()
            ),
            key=repr,
        )
        for t, df in out.items()
    }
    assert got == model_fanout(events, cache_model)

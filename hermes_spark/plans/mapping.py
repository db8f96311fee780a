"""Config-driven attribute mapping — the projection compiler (P1/P2).

The reference maps hermes attributes from remote columns three ways
(/root/reference/lib/datamodel/dataobject.py:117-165): a single remote
column, a list of columns combined into an array dropping nulls, or a
Jinja expression; the Jinja compiler also extracts undeclared template
variables to know which remote columns to fetch
(lib/datamodel/jinja.py:92-231) — the projection-pushdown input.

Spark restatement: the mapping config compiles to Column expressions —

    "attr": "colname"                 → F.col(colname)
    "attr": ["c1", "c2", ...]         → array_compact(array(c1, c2, ...))
    "attr": {"expr": "<SQL expr>"}    → F.expr(...)   (SQL is our
                                        expression language, analyzed by
                                        Catalyst instead of interpreted
                                        per row like Jinja)

``required_columns`` re-exposes the var-extraction: the input columns a
mapping needs (parsed from the analyzed expressions), which Catalyst
then prunes to at the scan.  Column scoping (P6/P7) lives here too:
secrets are excluded from cache/log sinks, LOCAL/CACHEONLY columns
excluded from events — as select-lists, not row logic.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MappingSpec = dict[str, object]  # attr -> str | list[str] | {"expr": str}


def compile_mapping(mapping: MappingSpec) -> dict[str, Column]:
    out: dict[str, Column] = {}
    for attr, spec in mapping.items():
        if isinstance(spec, str):
            out[attr] = F.col(spec)
        elif isinstance(spec, list):
            out[attr] = F.array_compact(F.array(*[F.col(c) for c in spec]))
        elif isinstance(spec, dict) and "expr" in spec:
            out[attr] = F.expr(spec["expr"])  # type: ignore[arg-type]
        else:
            raise ValueError(f"bad mapping spec for {attr!r}: {spec!r}")
    return out


def apply_mapping(df: DataFrame, mapping: MappingSpec) -> DataFrame:
    cols = compile_mapping(mapping)
    return df.select(*[c.alias(a) for a, c in cols.items()])


def _plan_references(df: DataFrame, expr: str) -> set[str]:
    """Attribute names an expression actually references, from the
    ANALYZED plan (Catalyst's resolution, not string matching)."""
    probe = df.select(F.expr(expr))
    refs = probe._jdf.queryExecution().analyzed().references()
    it = refs.iterator()
    names: set[str] = set()
    while it.hasNext():
        names.add(it.next().name())
    return names


def required_columns(df: DataFrame, mapping: MappingSpec) -> set[str]:
    """Input columns the mapping reads (the P2 var-extraction analog,
    reference lib/datamodel/jinja.py:92-231): expression specs are
    resolved by Catalyst and their analyzed-plan attribute references
    collected — the projection-pushdown input, with no false positives
    from substring matching."""
    needed: set[str] = set()
    available = set(df.columns)
    for spec in mapping.values():
        if isinstance(spec, str):
            needed.add(spec)
        elif isinstance(spec, list):
            needed.update(spec)
        elif isinstance(spec, dict) and "expr" in spec:
            needed.update(_plan_references(df, spec["expr"]))  # type: ignore[arg-type]
    return needed & available


@dataclass
class LocalTypeSpec:
    """One local type a remote event fans out to: its attr mapping
    (same spec language as ``apply_mapping``) and whether events whose
    mapped payload is entirely NULL should still be emitted."""

    name: str
    mapping: MappingSpec
    allow_empty: bool = False


_ADDED_OPS = ("insert", "added")
_MODIFIED_OPS = ("update", "modified")
_REMOVED_OPS = ("delete", "removed")


def union_fanout(
    fanned: dict[str, DataFrame], type_col: str = "_objtype"
) -> DataFrame:
    """Union the per-type frames ``fanout_events`` returns into ONE
    change stream tagged with the local type name — the shape the
    sink's per-objtype counters consume
    (``ExactlyOnceSink(type_col=..., type_names=tuple(fanned))``).
    Column sets may differ per type (each type's mapping projects its
    own payload); the union aligns by name and fills the gaps with
    NULLs, exactly how the evolved target conforms them."""
    out: DataFrame | None = None
    for name, df in fanned.items():
        tagged = df.withColumn(type_col, F.lit(name))
        out = tagged if out is None else out.unionByName(
            tagged, allowMissingColumns=True
        )
    if out is None:
        raise ValueError("union_fanout needs at least one type")
    return out


def fanout_events(
    events: DataFrame,
    types: Sequence[LocalTypeSpec],
    key_cols: Sequence[str],
    op_col: str = "op",
    passthrough: Sequence[str] = ("ts",),
    cache: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """One remote change event → N local-type events (the reference's
    ``convertEventToLocal``, /root/reference/clients/datamodel.py:
    497-621: every local type mapped from the remote type re-renders
    the event through its own attrsmapping).

    Per local type: key + op + passthrough columns survive unchanged,
    payload is re-projected through the type's mapping, and events
    whose mapped payload has no content are dropped — except deletes,
    which always pass (the reference emits removed events regardless
    of content, datamodel.py:608).  Pure projections: N narrow
    DataFrames over one scan, no shuffle, no Python.

    ``cache``: the client's cached remote rows (full objects, same
    remote column names, keyed by ``key_cols``).  With it, *modified*
    events are re-rendered against the COMPLETE cached object — the
    reference's partial-`modified` path (clients/datamodel.py:550-596,
    clients/__init__.py:983-994): the event's payload is an attr
    SUBSET, so each remote attr is coalesced over the cached value
    before template rendering (a multi-var template referencing an
    unsent attr renders from cache instead of NULL), and every
    rendered local attr is re-classified against the cached local row
    into ``attrs_added`` / ``attrs_modified`` / ``attrs_removed``
    (sorted name arrays).  Modified events whose re-render changes
    nothing for a local type are dropped for that type.  One key-join
    against the cache per type — broadcast- or storage-partitioned on
    a cluster, never row-at-a-time."""
    out: dict[str, DataFrame] = {}
    base = [F.col(c) for c in [*key_cols, op_col, *passthrough]]
    if cache is None:
        for t in types:
            cols = compile_mapping(t.mapping)
            has_content = F.lit(False)
            for c in cols.values():
                has_content = has_content | c.isNotNull()
            keep = (
                F.lit(True) if t.allow_empty
                else F.col(op_col).isin(*_REMOVED_OPS) | has_content
            )
            out[t.name] = events.where(keep).select(
                *base, *[c.alias(a) for a, c in cols.items()]
            )
        return out

    key_cols = list(key_cols)
    payload_cols = [
        c for c in events.columns
        if c not in (*key_cols, op_col, *passthrough)
    ]
    cache_names = set(cache.columns)
    is_mod = F.col(op_col).isin(*_MODIFIED_OPS)
    cpref = cache.select(
        *key_cols,
        *[F.col(c).alias(f"__c_{c}") for c in payload_cols if c in cache_names],
    )
    joined = events.join(cpref, key_cols, "left")
    # effective remote row: modified events fill unsent attrs from the
    # cached object; added events carry the full payload by contract
    eff_cols = []
    for c in payload_cols:
        v = F.col(c)
        if c in cache_names:
            v = F.when(is_mod, F.coalesce(F.col(c), F.col(f"__c_{c}"))).otherwise(
                F.col(c)
            )
        eff_cols.append(v.alias(c))
    eff = joined.select(*[F.col(c) for c in [*key_cols, op_col, *passthrough]],
                        *eff_cols)

    for t in types:
        cols = compile_mapping(t.mapping)
        attrs = sorted(cols)
        new_df = eff.select(*base, *[cols[a].alias(a) for a in attrs])
        # the same unresolved Column exprs render the OLD values when
        # selected from the cache frame (resolution is per-DataFrame)
        old_df = cache.select(
            *key_cols, *[cols[a].alias(f"__old_{a}") for a in attrs]
        )
        typed = new_df.join(old_df, key_cols, "left")

        def _arr(cond_of):
            return F.array_sort(
                F.array_compact(
                    F.array(*[F.when(cond_of(a), F.lit(a)) for a in attrs])
                )
            )

        def old(a):
            return F.col(f"__old_{a}")

        is_add = F.col(op_col).isin(*_ADDED_OPS)
        is_del = F.col(op_col).isin(*_REMOVED_OPS)
        added = F.when(is_del, F.array().cast("array<string>")).when(
            is_add, _arr(lambda a: F.col(a).isNotNull())
        ).otherwise(_arr(lambda a: old(a).isNull() & F.col(a).isNotNull()))
        modified = F.when(is_mod, _arr(
            lambda a: old(a).isNotNull()
            & F.col(a).isNotNull()
            & (old(a) != F.col(a))
        )).otherwise(F.array().cast("array<string>"))
        removed = F.when(is_mod, _arr(
            lambda a: old(a).isNotNull() & F.col(a).isNull()
        )).otherwise(F.array().cast("array<string>"))

        has_content = F.lit(False)
        for a in attrs:
            has_content = has_content | F.col(a).isNotNull()
        any_change = (
            F.size(added) + F.size(modified) + F.size(removed)
        ) > 0
        # ops outside the CDC vocabulary fall back to the no-cache
        # rule (keep when the payload has content) — the cached path
        # must never silently drop events the plain path passes through
        keep = (
            F.lit(True) if t.allow_empty
            else is_del
            | (is_mod & any_change)
            | (~is_del & ~is_mod & has_content)
        )
        out[t.name] = (
            typed.withColumn("attrs_added", added)
            .withColumn("attrs_modified", modified)
            .withColumn("attrs_removed", removed)
            .where(keep)
            .drop(*[f"__old_{a}" for a in attrs])
        )
    return out


@dataclass
class ColumnScopes:
    """P6/P7 scoping: which columns each sink sees.

    secrets: never cached/persisted/logged, still present in events
    (reference dataobject.py:249-257, event.py:140-162).
    local_only: client-side only — not in events or diffs.
    cache_only: cached, excluded from events/diffs.
    """

    secrets: tuple[str, ...] = ()
    local_only: tuple[str, ...] = ()
    cache_only: tuple[str, ...] = ()
    key: tuple[str, ...] = ()

    def event_columns(self, df: DataFrame) -> list[str]:
        drop = set(self.local_only) | set(self.cache_only)
        return [c for c in df.columns if c not in drop]

    def cache_columns(self, df: DataFrame) -> list[str]:
        drop = set(self.secrets) | set(self.local_only)
        return [c for c in df.columns if c not in drop]

    def diff_columns(self, df: DataFrame) -> list[str]:
        drop = (
            set(self.secrets)
            | set(self.local_only)
            | set(self.cache_only)
            | set(self.key)
        )
        return [c for c in df.columns if c not in drop]

    def masked_for_log(self, df: DataFrame) -> DataFrame:
        cols = [
            F.lit("<secret>").alias(c) if c in self.secrets else F.col(c)
            for c in df.columns
        ]
        return df.select(*cols)

